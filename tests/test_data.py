"""Training data pipeline: sharded format, deterministic resumable loader,
prefetch equivalence, and deployment-exact preprocessing parity.

The reference has no training pipeline (SURVEY.md §0), so the oracles here
are the repo's own DEPLOYMENT path: the transform must match the env
adapters' preprocessing (utils/image resize ladder + VLAProcessor pixel
math + BaseEnvAdapter normalization) so train and serve distributions are
identical by construction.
"""

import numpy as np
import pytest

from blurr_tpu.data import (
    Pi0TrainTransform,
    ShardedBatchLoader,
    ShardedDataset,
    ShardWriter,
    device_prefetch,
    is_sharded_dataset,
    write_dataset,
)


def _toy_arrays(n, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "action": rng.randn(n, 4, 7).astype(np.float32),
        "proprio": rng.randn(n, 7).astype(np.float32),
        "step_id": np.arange(n, dtype=np.int64),
    }


class TestShards:
    def test_roundtrip_multi_shard(self, tmp_path):
        arrays = _toy_arrays(11)
        manifest = write_dataset(tmp_path / "ds", arrays, shard_size=4)
        assert manifest["num_examples"] == 11
        assert [s["num_examples"] for s in manifest["shards"]] == [4, 4, 3]
        assert is_sharded_dataset(tmp_path / "ds")

        ds = ShardedDataset(tmp_path / "ds")
        assert ds.num_examples == 11
        all_idx = np.arange(11)
        for k, v in arrays.items():
            np.testing.assert_array_equal(ds.gather(k, all_idx), v)
        ex = ds.example(6)
        for k, v in arrays.items():
            np.testing.assert_array_equal(ex[k], v[6])

    def test_gather_cross_shard_unordered_with_duplicates(self, tmp_path):
        arrays = _toy_arrays(10, seed=1)
        write_dataset(tmp_path / "ds", arrays, shard_size=3)
        ds = ShardedDataset(tmp_path / "ds")
        idx = np.array([9, 0, 4, 4, 7, 1])
        got = ds.gather("action", idx)
        np.testing.assert_array_equal(got, arrays["action"][idx])

    def test_gather_out_of_range_raises(self, tmp_path):
        write_dataset(tmp_path / "ds", _toy_arrays(5), shard_size=5)
        ds = ShardedDataset(tmp_path / "ds")
        with pytest.raises(IndexError):
            ds.gather("action", np.array([5]))

    def test_writer_signature_mismatch_raises(self, tmp_path):
        w = ShardWriter(tmp_path / "ds", shard_size=4)
        w.add({"a": np.zeros(3, np.float32)})
        with pytest.raises(ValueError, match="signature"):
            w.add({"a": np.zeros(4, np.float32)})

    def test_writer_statistics_in_manifest(self, tmp_path):
        stats = {"action": {"p01": [0.0], "p99": [1.0]}}
        write_dataset(tmp_path / "ds", {"a": np.zeros((3, 1))},
                      statistics=stats)
        assert ShardedDataset(tmp_path / "ds").statistics == stats

    def test_add_batch_matches_per_example_adds(self, tmp_path):
        arrays = _toy_arrays(6, seed=2)
        with ShardWriter(tmp_path / "a", shard_size=4) as w:
            w.add_batch(arrays)
        with ShardWriter(tmp_path / "b", shard_size=4) as w:
            for i in range(6):
                w.add({k: v[i] for k, v in arrays.items()})
        da, db = ShardedDataset(tmp_path / "a"), ShardedDataset(tmp_path / "b")
        for k in arrays:
            np.testing.assert_array_equal(
                da.gather(k, np.arange(6)), db.gather(k, np.arange(6))
            )


class TestLoader:
    def _ds(self, tmp_path, n=10):
        write_dataset(tmp_path / "ds", _toy_arrays(n), shard_size=4)
        return ShardedDataset(tmp_path / "ds")

    def test_deterministic_across_instances_and_epochs(self, tmp_path):
        ds = self._ds(tmp_path)
        a = ShardedBatchLoader(ds, batch_size=4, seed=7)
        b = ShardedBatchLoader(ds, batch_size=4, seed=7)
        assert a.batches_per_epoch == 2  # 10 // 4, remainder dropped
        seen = []
        for _ in range(5):  # crosses into epoch 2
            ba, bb = a.next_batch(), b.next_batch()
            np.testing.assert_array_equal(ba["step_id"], bb["step_id"])
            seen.append(ba["step_id"])
        # epochs use different permutations
        assert not np.array_equal(
            np.sort(np.concatenate(seen[0:2])),
            np.concatenate(seen[2:4]),
        ) or not np.array_equal(seen[0], seen[2])

    def test_epoch_covers_each_example_once(self, tmp_path):
        ds = self._ds(tmp_path, n=8)
        ld = ShardedBatchLoader(ds, batch_size=4, seed=3)
        ids = np.concatenate(
            [ld.next_batch()["step_id"] for _ in range(ld.batches_per_epoch)]
        )
        np.testing.assert_array_equal(np.sort(ids), np.arange(8))

    def test_no_shuffle_is_sequential(self, tmp_path):
        ds = self._ds(tmp_path, n=8)
        ld = ShardedBatchLoader(ds, batch_size=4, seed=3, shuffle=False)
        np.testing.assert_array_equal(
            ld.next_batch()["step_id"], np.arange(4)
        )

    def test_o1_resume_matches_uninterrupted(self, tmp_path):
        ds = self._ds(tmp_path)
        full = ShardedBatchLoader(ds, batch_size=4, seed=11)
        stream = [full.next_batch()["step_id"] for _ in range(7)]

        part = ShardedBatchLoader(ds, batch_size=4, seed=11)
        for _ in range(3):
            part.next_batch()
        state = part.state()
        assert state == {"consumed": 3}

        resumed = ShardedBatchLoader(ds, batch_size=4, seed=11)
        resumed.restore(state)
        for t in range(3, 7):
            np.testing.assert_array_equal(
                resumed.next_batch()["step_id"], stream[t]
            )

    def test_prefetch_equals_sync(self, tmp_path):
        ds = self._ds(tmp_path)
        sync = ShardedBatchLoader(ds, batch_size=2, seed=5)
        with ShardedBatchLoader(ds, batch_size=2, seed=5, prefetch=3) as pre:
            for _ in range(12):
                np.testing.assert_array_equal(
                    pre.next_batch()["step_id"], sync.next_batch()["step_id"]
                )

    def test_prefetch_restore_restarts_stream(self, tmp_path):
        ds = self._ds(tmp_path)
        sync = ShardedBatchLoader(ds, batch_size=2, seed=5)
        stream = [sync.next_batch()["step_id"] for _ in range(6)]
        with ShardedBatchLoader(ds, batch_size=2, seed=5, prefetch=2) as pre:
            for _ in range(4):
                pre.next_batch()
            pre.restore(2)
            for t in range(2, 6):
                np.testing.assert_array_equal(
                    pre.next_batch()["step_id"], stream[t]
                )

    def test_device_prefetch_matches_direct(self, tmp_path):
        ds = self._ds(tmp_path, n=8)
        direct = ShardedBatchLoader(ds, batch_size=4, seed=9)
        fed = ShardedBatchLoader(ds, batch_size=4, seed=9)
        feed = device_prefetch(fed, depth=2)
        for _ in range(4):
            dev = next(feed)
            host = direct.next_batch()
            for k in host:
                np.testing.assert_array_equal(np.asarray(dev[k]), host[k])

    def test_batch_too_large_raises(self, tmp_path):
        ds = self._ds(tmp_path, n=3)
        with pytest.raises(ValueError, match="< one batch"):
            ShardedBatchLoader(ds, batch_size=4)


class TestTransform:
    def _stats(self):
        from blurr_tpu.paths import config_root

        return str(config_root() / "bridge_statistics.json")

    def test_pixels_match_deployment_path(self):
        """transform.pixels == adapter resize ladder + VLAProcessor pixel
        math, bit-identical (same resize call, same op order)."""
        from blurr_tpu.models.pi0.processing import process_images
        from blurr_tpu.utils.image import lanczos_resize_uint8

        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (2, 80, 60, 3), np.uint8)
        tf = Pi0TrainTransform(self._stats(), image_size=(56, 56))
        got = tf.pixels(imgs)

        want = np.stack([
            np.asarray(process_images(
                lanczos_resize_uint8(im, 56, 56).transpose(2, 0, 1)[None]
            ))[0]
            for im in imgs
        ])
        np.testing.assert_array_equal(got, want)

    def test_proprio_matches_adapter_normalization(self):
        import json

        from blurr_tpu.agent.env_adapter.base import BaseEnvAdapter

        stats = json.load(open(self._stats()))
        rng = np.random.RandomState(1)
        raw = rng.randn(3, 7)
        tf = Pi0TrainTransform(self._stats(), cond_steps=2)
        got = tf.proprios(raw)
        assert got.shape == (3, 2, 7)
        want = BaseEnvAdapter().normalize_bound(
            raw,
            np.asarray(stats["proprio"]["p01"]),
            np.asarray(stats["proprio"]["p99"]),
            clip_min=-1, clip_max=1,
        )
        np.testing.assert_allclose(got[:, 0], want.astype(np.float32))
        np.testing.assert_array_equal(got[:, 0], got[:, 1])

    def test_actions_are_inverse_of_adapter_postprocess(self):
        """Non-gripper dims: adapter denormalize(transform(raw)) == raw (up
        to the reference's documented eps asymmetry); gripper passes through
        clipped — the adapters binarize it raw, never denormalize."""
        import json

        from blurr_tpu.agent.env_adapter.base import BaseEnvAdapter

        stats = json.load(open(self._stats()))
        p01 = np.asarray(stats["action"]["p01"])
        p99 = np.asarray(stats["action"]["p99"])
        rng = np.random.RandomState(2)
        # raw actions inside the stats bounds so clipping is not in play
        frac = rng.rand(2, 4, 7)
        raw = p01 + frac * (p99 - p01)
        tf = Pi0TrainTransform(self._stats())
        norm = tf.actions(raw)
        assert norm.shape == (2, 4, 7)
        assert np.all(norm >= -1) and np.all(norm <= 1)

        back = BaseEnvAdapter().denormalize_bound(
            norm[..., :-1].astype(np.float64), p01[:-1], p99[:-1],
            clip_min=-1, clip_max=1,
        )
        np.testing.assert_allclose(back, raw[..., :-1], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            norm[..., -1], np.clip(raw[..., -1], -1, 1), rtol=1e-6, atol=1e-7
        )

    def test_model_ready_batch_passes_through(self):
        tf = Pi0TrainTransform(self._stats())
        batch = {"pixel_values": np.zeros((1, 3, 4, 4), np.float32),
                 "actions": np.zeros((1, 4, 7), np.float32)}
        out = tf(batch)
        assert out.keys() == batch.keys()
        np.testing.assert_array_equal(out["actions"], batch["actions"])


def _write_raw_tiny_dataset(path, n, cfg, seed=0):
    """Raw robot-log-style dataset at bridge_tiny dims: uint8 camera frames
    (bigger than the model input), pre-tokenized ids, raw proprio/action."""
    rng = np.random.RandomState(seed)
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    seq = cfg["max_image_text_tokens"]
    ids = np.zeros((n, seq), np.int32)
    am = np.zeros((n, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img:n_img + 6] = rng.randint(3, 1000, (n, 6))
    am[:, :n_img + 6] = 1
    write_dataset(path, {
        "image": rng.randint(0, 256, (n, 72, 96, 3), np.uint8),
        "input_ids": ids,
        "attention_mask": am,
        "proprio": rng.randn(n, cfg["proprio_dim"]).astype(np.float32),
        "action": rng.randn(
            n, cfg["horizon_steps"], cfg["action_dim"]
        ).astype(np.float32),
    }, shard_size=5)


class TestTrainCLIShardedData:
    def test_exact_resume_with_sharded_dataset(self, tmp_path, monkeypatch):
        """4 straight steps on a RAW sharded dataset == 2 steps -> save full
        state -> resume -> 2 more, bitwise — the loader's O(1) restore
        reproduces the batch stream exactly (incl. the prefetch thread)."""
        import sys

        import jax

        import scripts.train_pi0_flow as cli
        from blurr_tpu.benchmarks import load_cfg
        from blurr_tpu.models.pi0.checkpoint import restore_params

        cfg = load_cfg("config/eval/bridge_tiny.yaml")
        data = tmp_path / "raw_ds"
        _write_raw_tiny_dataset(data, n=12, cfg=cfg)

        base = ["train_pi0_flow.py", "--config",
                "config/eval/bridge_tiny.yaml", "--data", str(data),
                "--batch-size", "2", "--steps", "4"]
        d_full = tmp_path / "full"
        monkeypatch.setattr(sys, "argv", base + ["--save-dir", str(d_full)])
        cli.main()

        st = tmp_path / "state"
        monkeypatch.setattr(
            sys, "argv", base + ["--stop-after", "2", "--save-state", str(st)]
        )
        cli.main()

        d_res = tmp_path / "resumed"
        monkeypatch.setattr(
            sys, "argv",
            base + ["--resume-state", str(st), "--save-dir", str(d_res)],
        )
        cli.main()

        full = restore_params(str(d_full))
        res = restore_params(str(d_res))
        for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(res)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_example_range_split():
    """Train/val windows partition the index space: a (0, n-k) loader never
    emits a held-out index, the (n-k, n) loader emits exactly those, and
    the windowed stream stays O(1)-restorable."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "ds"
        write_dataset(path, {"idx": np.arange(20, dtype=np.int64)[:, None]},
                      shard_size=6)
        tr = ShardedBatchLoader(path, 4, seed=7, example_range=(0, 16))
        seen = set()
        for _ in range(2 * tr.batches_per_epoch):
            seen.update(tr.next_batch()["idx"].ravel().tolist())
        assert seen == set(range(16))

        va = ShardedBatchLoader(path, 4, seed=7, shuffle=False,
                                example_range=(16, 20))
        assert va.next_batch()["idx"].ravel().tolist() == [16, 17, 18, 19]

        # windowed resume: replaying from a fresh loader reproduces batch t
        t = 3
        probe = ShardedBatchLoader(path, 4, seed=7, example_range=(0, 16))
        probe.restore(t)
        tr2 = ShardedBatchLoader(path, 4, seed=7, example_range=(0, 16))
        for _ in range(t):
            tr2.next_batch()
        np.testing.assert_array_equal(
            probe.next_batch()["idx"], tr2.next_batch()["idx"]
        )


class TestTrainCLIValidation:
    def test_val_split_and_metrics(self, tmp_path, monkeypatch):
        """--val-examples holds out the dataset tail, --val-every logs a
        comparable fixed-draw validation loss, and the metrics CSV carries
        the val_loss column on validation steps."""
        import csv
        import sys

        import scripts.train_pi0_flow as cli
        from blurr_tpu.benchmarks import load_cfg

        cfg = load_cfg("config/eval/bridge_tiny.yaml")
        data = tmp_path / "raw_ds"
        _write_raw_tiny_dataset(data, n=12, cfg=cfg)
        mcsv = tmp_path / "metrics.csv"
        monkeypatch.setattr(
            sys, "argv",
            ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
             "--data", str(data), "--batch-size", "2", "--steps", "4",
             "--val-examples", "4", "--val-every", "2", "--log-every", "1",
             "--metrics-csv", str(mcsv)],
        )
        cli.main()
        rows = list(csv.reader(mcsv.open()))
        assert rows[0][-1] == "val_loss"
        vals = [r[-1] for r in rows[1:]]
        # steps 2 and 4 validated (1-indexed steps_done), finite values
        assert vals[1] != "" and vals[3] != ""
        assert float(vals[1]) > 0 and float(vals[3]) > 0
        assert vals[0] == "" and vals[2] == ""


def test_prefetch_producer_error_propagates():
    """A transform that raises on some batch must surface in next_batch()
    (the old producer died silently and the consumer hung forever)."""
    import tempfile
    from pathlib import Path

    import pytest

    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "ds"
        write_dataset(path, {"x": np.arange(8, dtype=np.float32)[:, None]},
                      shard_size=4)

        calls = {"n": 0}

        def poison(batch):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("corrupt example")
            return batch

        loader = ShardedBatchLoader(path, 2, seed=0, transform=poison,
                                    prefetch=2)
        try:
            loader.next_batch()  # first batch fine
            with pytest.raises(RuntimeError, match="corrupt example"):
                for _ in range(4):
                    loader.next_batch()
        finally:
            loader.close()
