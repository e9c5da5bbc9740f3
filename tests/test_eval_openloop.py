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


# ----------------------------------------------------------------------
# OpenVLA-family evaluator (scripts/eval_openloop_vla.py)

import scripts.eval_openloop_vla as vla_cli


def _run_vla(tmp_path, monkeypatch, *extra):
    out = tmp_path / f"v{np.random.randint(1 << 30)}.json"
    argv = ["eval_openloop_vla.py", "--model-id", "random", "--dtype",
            "fp32", "--output-json", str(out), *extra]
    monkeypatch.setattr(sys, "argv", argv)
    vla_cli.main()
    with open(out) as f:
        return json.load(f)


def test_vla_ar_deterministic_schema(tmp_path, monkeypatch):
    a = _run_vla(tmp_path, monkeypatch, "--examples", "6",
                 "--batch-size", "4")
    b = _run_vla(tmp_path, monkeypatch, "--examples", "6",
                 "--batch-size", "4")
    assert a == b  # greedy decode: bit-stable reruns
    for k in ("mse", "mae", "token_accuracy", "gripper_agreement"):
        assert k in a, k
    assert a["variant"] == "ar" and a["examples"] == 6


def test_vla_ar_self_consistency_perfect_score(tmp_path, monkeypatch):
    """Score the model against a dataset of its OWN predictions: token
    accuracy must be exactly 1.0 and MSE 0.0 — proves the whole pipeline
    (prompt tokenization, ragged batching, tail padding, detokenize) is
    the inverse of itself, with a padded tail batch in the loop."""
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.models.openvla.data import write_openvla_dataset
    from blurr_tpu.models.openvla.processing import (
        StubLlamaTokenizer,
        process_image,
        tokenize_prompt_ids,
    )

    built = build_openvla("random", dtype=jnp.float32)
    model, params, spec = built.model, built.params, built.spec
    rng = np.random.RandomState(5)
    n = 6
    images = rng.randint(0, 256, (n, spec.siglip.image_size,
                                  spec.siglip.image_size, 3), np.uint8)
    instructions = ["pick up the carrot", "stack the green block"] * 3
    tok = StubLlamaTokenizer()
    max_t = 32
    ids = np.zeros((n, max_t), np.int32)
    lens = np.zeros((n,), np.int32)
    for i, s in enumerate(instructions):
        t = tokenize_prompt_ids(tok, s, max_t)
        ids[i, :len(t)] = t
        lens[i] = len(t)
    valid = (np.arange(max_t)[None, :] < lens[:, None]).astype(np.int32)
    px = np.concatenate([
        process_image(im, spec.siglip.image_size, spec.use_fused_vision)
        for im in images])
    toks = np.asarray(model.predict_action_tokens_ragged(
        params, jnp.asarray(ids), jnp.asarray(px, jnp.float32),
        jnp.asarray(valid)))
    actions = model.detokenize_actions(toks).astype(np.float32)

    write_openvla_dataset(tmp_path / "self", images, instructions, actions,
                          max_text_tokens=max_t, shard_size=4)
    got = _run_vla(tmp_path, monkeypatch, "--data", str(tmp_path / "self"),
                   "--examples", "6", "--batch-size", "4")
    # actions are bit-identical (dataset stores float32 bin centers;
    # detokenize recomputes them in float64 -> ~1e-8 mae headroom)
    assert got["mse"] < 1e-12 and got["mae"] < 1e-6
    assert got["gripper_agreement"] == 1.0
    # token accuracy is the STANDARD raw-token metric: a random model
    # emits tokens outside the 256-bin action range, detokenize clips
    # them, and tokenize_actions maps the clipped value to the canonical
    # in-range token — so accuracy equals the roundtrip-stable fraction
    # (1.0 for a trained model, whose logits concentrate on action bins)
    expected = float(
        (toks == model.tokenize_actions(model.detokenize_actions(toks)))
        .mean())
    assert got["token_accuracy"] == expected


def test_vla_oft_schema(tmp_path, monkeypatch):
    got = _run_vla(tmp_path, monkeypatch, "--oft", "--chunk-len", "4",
                   "--use-proprio", "--proprio-dim", "5",
                   "--examples", "5", "--batch-size", "4",
                   "--act-steps", "2")
    assert got["variant"] == "oft"
    for k in ("l1", "mse_prefix", "mse", "gripper_agreement"):
        assert k in got, k
    assert got["act_steps"] == 2 and got["examples"] == 5


def test_npz_missing_actions_exits(tmp_path, monkeypatch):
    bad = tmp_path / "bad.npz"
    np.savez(bad, foo=np.zeros((4, 1)))
    with pytest.raises(SystemExit, match="missing keys"):
        _run(tmp_path, monkeypatch, "--data", str(bad),
             "--examples", "4", "--batch-size", "2")


def test_vla_variant_shape_mismatch_exits(tmp_path, monkeypatch):
    """--oft against an AR dataset (and vice versa) must exit with a clear
    message instead of broadcasting into silently wrong metrics."""
    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.models.openvla.data import write_openvla_dataset

    import jax.numpy as jnp

    spec = build_openvla("random", dtype=jnp.float32).spec
    rng = np.random.RandomState(0)
    n = 4
    imgs = rng.randint(0, 256, (n, spec.siglip.image_size,
                                spec.siglip.image_size, 3), np.uint8)
    instr = ["pick up the carrot"] * n
    ar_actions = rng.rand(n, spec.action_dim).astype(np.float32) * 2 - 1
    write_openvla_dataset(tmp_path / "ar", imgs, instr, ar_actions,
                          shard_size=4)
    with pytest.raises(SystemExit, match="--oft expects actions"):
        _run_vla(tmp_path, monkeypatch, "--data", str(tmp_path / "ar"),
                 "--oft", "--chunk-len", "4",
                 "--examples", "4", "--batch-size", "4")
    chunk_actions = rng.rand(n, 4, spec.action_dim).astype(np.float32)
    write_openvla_dataset(tmp_path / "oft", imgs, instr, chunk_actions,
                          shard_size=4)
    with pytest.raises(SystemExit, match="AR eval expects actions"):
        _run_vla(tmp_path, monkeypatch, "--data", str(tmp_path / "oft"),
                 "--examples", "4", "--batch-size", "4")


def test_dp2_matches_single_device(tmp_path, monkeypatch):
    """--dp 2 splits each batch over the 'data' mesh axis; per-example
    math is unchanged, so metrics match the single-device run."""
    a = _run(tmp_path, monkeypatch, "--examples", "8", "--batch-size", "4")
    b = _run(tmp_path, monkeypatch, "--examples", "8", "--batch-size", "4",
             "--dp", "2")
    for k in ("mse", "mae", "eef_l2", "gripper_agreement"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6), k


def test_dp_requires_divisible_batch(tmp_path, monkeypatch):
    with pytest.raises(SystemExit, match="divisible"):
        _run(tmp_path, monkeypatch, "--examples", "4", "--batch-size", "3",
             "--dp", "2")
