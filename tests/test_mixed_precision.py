"""Master-weight mixed precision (fp32 masters + bf16 compute).

The reference trains fp32/bf16 directly; master-fp32 is the TPU-production
numerics the train step grew in round 3: ``make_optax_train_step(...,
compute_dtype=jnp.bfloat16)`` keeps the optimizer state and the updated
parameters in fp32 while the forward/backward run on a bf16 cast of them —
tiny updates below the bf16 grid (|lr·g| < ulp(p)/2) accumulate instead of
rounding away.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from blurr_tpu.parallel.train import make_optax_train_step
from tests.util import tiny_inputs, tiny_pi0_cfg


@pytest.fixture(scope="module")
def model_and_canon():
    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    params = model.canonicalize_tied_weights(params)
    # snap the fp32 masters onto the bf16 grid so a pure-bf16 run and a
    # master-fp32 run start from EXACTLY the same forward
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16).astype(jnp.float32), params
    )
    return model, params


def _batch(model):
    rng = np.random.RandomState(0)
    inputs = tiny_inputs(model.cfg)
    return {
        "input_ids": inputs["input_ids"],
        "attention_mask": inputs["attention_mask"],
        "pixel_values": inputs["pixel_values"],
        "proprios": inputs["proprios"],
        "actions": jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
    }


def _float_leaves(params):
    return [
        l for l in jax.tree.leaves(params)
        if jnp.issubdtype(l.dtype, jnp.floating)
    ]


def test_master_fp32_keeps_fp32_masters(model_and_canon):
    model, params = model_and_canon
    tx = optax.adamw(1e-3)
    step = make_optax_train_step(model, tx, compute_dtype=jnp.bfloat16)
    opt = tx.init(params)
    batch = _batch(model)
    key = jax.random.PRNGKey(7)
    p1, opt, l1 = step(params, opt, batch, key)
    p2, opt, l2 = step(p1, opt, batch, key)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # masters stay fp32 through the update, and they actually moved
    assert all(l.dtype == jnp.float32 for l in _float_leaves(p2))
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(_float_leaves(params), _float_leaves(p2))
    )
    assert moved > 0
    # adamw moments live in the master dtype too
    assert all(
        l.dtype == jnp.float32 for l in jax.tree.leaves(opt)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    )


def test_master_fp32_forward_equals_bf16_params(model_and_canon):
    """With masters already ON the bf16 grid, the master-fp32 step's loss is
    the pure-bf16 step's loss exactly — the only difference is where the
    rounding happens (cast-in-forward vs cast-at-rest)."""
    model, params = model_and_canon
    tx = optax.adamw(1e-3)
    batch = _batch(model)
    key = jax.random.PRNGKey(7)

    step_m = make_optax_train_step(model, tx, compute_dtype=jnp.bfloat16)
    _, _, loss_m = step_m(params, tx.init(params), batch, key)

    bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    step_b = make_optax_train_step(model, tx)
    _, _, loss_b = step_b(bf16, tx.init(bf16), batch, key)

    assert float(loss_m) == float(loss_b)


def test_master_fp32_accumulates_subulp_updates(model_and_canon):
    """The reason master weights exist: with lr so small that every update
    is below the bf16 grid for the (non-tiny) weights, pure-bf16 training
    freezes while fp32 masters keep integrating the gradient."""
    model, params = model_and_canon
    lr = 1e-7
    batch = _batch(model)
    steps = 8

    def run(p0, compute_dtype):
        tx = optax.sgd(lr)
        step = make_optax_train_step(model, tx, compute_dtype=compute_dtype)
        opt = tx.init(p0)
        p = p0
        for i in range(steps):
            p, opt, _ = step(p, opt, batch, jax.random.PRNGKey(i))
        return p

    p_master = run(params, jnp.bfloat16)
    p_bf16 = run(jax.tree.map(lambda p: p.astype(jnp.bfloat16), params),
                 None)

    # embed_tokens is comfortably above the denormal range where bf16's grid
    # is fine; there the bf16 run must be bitwise frozen...
    emb0 = np.asarray(params["embed_tokens"], np.float32)
    emb_b = np.asarray(p_bf16["embed_tokens"], np.float32)
    sig = np.abs(emb0) > 1e-2
    assert sig.any()
    np.testing.assert_array_equal(emb_b[sig], emb0[sig])
    # ...while the fp32 masters integrated all 8 sub-ulp updates
    emb_m = np.asarray(p_master["embed_tokens"], np.float32)
    assert np.abs(emb_m - emb0).sum() > 0


def test_master_fp32_composes_with_dp_mesh(model_and_canon):
    """compute_dtype is orthogonal to GSPMD sharding: the bf16 compute copy
    inherits the masters' NamedShardings, so a DP-sharded master-fp32 step
    produces the unsharded step's loss."""
    model, params = model_and_canon
    tx = optax.adamw(1e-3)
    batch = _batch(model)
    key = jax.random.PRNGKey(3)

    step = make_optax_train_step(model, tx, compute_dtype=jnp.bfloat16)
    _, _, ref_loss = step(params, tx.init(params), batch, key)

    mesh = make_mesh(data=2, model=1)
    sharded = shard_params(params, mesh)
    bsh = batch_sharding(mesh)
    sbatch = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
    step_s = make_optax_train_step(model, tx, compute_dtype=jnp.bfloat16)
    with mesh:
        p1, _, loss_s = step_s(sharded, tx.init(sharded), sbatch, key)
    np.testing.assert_allclose(float(loss_s), float(ref_loss),
                               rtol=2e-2, atol=1e-3)
    assert all(l.dtype == jnp.float32 for l in _float_leaves(p1))


def test_train_cli_dtype_flags(tmp_path, monkeypatch):
    """--dtype master-fp32 and --dtype bf16 drive end-to-end through the CLI
    (incl. the validation path, which must follow the training compute
    dtype or the bf16 layer-scan carry fails to trace)."""
    import sys

    import scripts.train_pi0_flow as cli
    from blurr_tpu.benchmarks import load_cfg
    from tests.test_data import _write_raw_tiny_dataset

    cfg = load_cfg("config/eval/bridge_tiny.yaml")
    data = tmp_path / "raw_ds"
    _write_raw_tiny_dataset(data, n=10, cfg=cfg)
    base = ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
            "--steps", "2", "--batch-size", "2", "--data", str(data),
            "--val-examples", "2", "--val-every", "1"]
    for dtype in ("master-fp32", "bf16"):
        monkeypatch.setattr(sys, "argv", base + ["--dtype", dtype])
        cli.main()
