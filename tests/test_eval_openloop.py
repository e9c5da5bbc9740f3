"""Open-loop dataset evaluation CLI (scripts/eval_openloop.py).

Covers: deterministic reruns, padded-tail-batch exclusion (metrics equal a
manual recomputation that never pads), and the sharded-dataset validation
window (the split train_pi0_flow --val-examples holds out).
"""

import json
import sys

import numpy as np
import pytest

import scripts.eval_openloop as cli
from blurr_tpu.data import write_dataset

CFG = "config/eval/bridge_tiny.yaml"


def _run(tmp_path, monkeypatch, *extra):
    out = tmp_path / f"m{np.random.randint(1 << 30)}.json"
    argv = ["eval_openloop.py", "--config", CFG, "--checkpoint", "random",
            "--output-json", str(out), *extra]
    monkeypatch.setattr(sys, "argv", argv)
    cli.main()
    with open(out) as f:
        return json.load(f)


def test_synthetic_deterministic_and_schema(tmp_path, monkeypatch):
    a = _run(tmp_path, monkeypatch, "--examples", "6", "--batch-size", "4",
             "--act-steps", "2")
    b = _run(tmp_path, monkeypatch, "--examples", "6", "--batch-size", "4",
             "--act-steps", "2")
    assert a == b  # fold_in(key, batch_idx) noise: reruns are bit-stable
    for k in ("mse", "mae", "mse_prefix", "eef_l2", "gripper_agreement",
              "per_dim_mse", "examples", "horizon", "act_steps"):
        assert k in a, k
    assert a["examples"] == 6
    assert a["act_steps"] == 2
    assert len(a["per_dim_mse"]) == 7
    assert 0.0 <= a["gripper_agreement"] <= 1.0
    # mean of per-dim MSEs is the overall MSE
    np.testing.assert_allclose(np.mean(a["per_dim_mse"]), a["mse"], rtol=1e-9)


def test_padded_tail_batch_excluded(tmp_path, monkeypatch):
    """examples=6 with batch 4 pads the tail batch (2 live + 2 repeats);
    the metrics must equal a manual recomputation over exactly 6 rows."""
    import jax
    import jax.numpy as jnp

    from blurr_tpu import benchmarks as B

    got = _run(tmp_path, monkeypatch, "--examples", "6", "--batch-size", "4",
               "--seed", "11")

    cfg = B.load_cfg(CFG)
    model, params = B.load_model(cfg, "random", jnp.float32)
    data = cli._synthetic_examples(cfg, 6, 11 + 7)
    key = jax.random.PRNGKey(11)
    infer = jax.jit(model.infer_action)
    preds = []
    for bidx, lo in enumerate(range(0, 6, 4)):
        hi = min(lo + 4, 6)
        batch = {k: v[lo:hi] for k, v in data.items()}
        live = hi - lo
        if live < 4:
            batch = {k: np.concatenate([v] + [v[-1:]] * (4 - live))
                     for k, v in batch.items()}
        noise = jax.random.normal(
            jax.random.fold_in(key, bidx), (4, 4, 7), jnp.float32)
        out = np.asarray(infer(
            params,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["pixel_values"]),
            jnp.asarray(batch["proprios"]),
            noise,
        ))[:live]
        preds.append(out)
    pred = np.concatenate(preds).astype(np.float64)
    gt = data["actions"].astype(np.float64)
    np.testing.assert_allclose(
        got["mse"], ((pred - gt) ** 2).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        got["gripper_agreement"],
        (np.sign(pred[..., -1]) == np.sign(gt[..., -1])).mean(), rtol=1e-9)


def test_sharded_dataset_validation_window(tmp_path, monkeypatch):
    from blurr_tpu import benchmarks as B

    cfg = B.load_cfg(CFG)
    rng = np.random.RandomState(3)
    n = 12
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    seq = cfg["max_image_text_tokens"]
    ids = np.zeros((n, seq), np.int32)
    am = np.zeros((n, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img:n_img + 6] = rng.randint(3, 1000, (n, 6))
    am[:, :n_img + 6] = 1
    write_dataset(tmp_path / "ds", {
        "image": rng.randint(0, 256, (n, 72, 96, 3), np.uint8),
        "input_ids": ids,
        "attention_mask": am,
        "proprio": rng.randn(n, cfg["proprio_dim"]).astype(np.float32),
        "action": rng.randn(
            n, cfg["horizon_steps"], cfg["action_dim"]).astype(np.float32),
    }, shard_size=5)

    got = _run(tmp_path, monkeypatch, "--data", str(tmp_path / "ds"),
               "--examples", "6", "--batch-size", "4")
    assert got["examples"] == 6
    assert np.isfinite(got["mse"])
    # raw actions pass through Pi0TrainTransform: targets live in [-1, 1],
    # and so do the model's clipped outputs => MSE is bounded by 4
    assert got["mse"] <= 4.0


def test_missing_keys_exits(tmp_path, monkeypatch):
    write_dataset(tmp_path / "bad", {"foo": np.zeros((4, 1))}, shard_size=4)
    with pytest.raises(SystemExit, match="missing keys"):
        _run(tmp_path, monkeypatch, "--data", str(tmp_path / "bad"),
             "--examples", "4", "--batch-size", "2")
