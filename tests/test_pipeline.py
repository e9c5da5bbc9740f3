"""Pipeline parallelism (parallel/pipeline.py): the SPMD GPipe schedule over
the stacked layer axis must be a drop-in for jax.lax.scan — values AND
gradients — on the 8-device virtual CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp

from blurr_tpu.utils.optim import masked_freeze
import numpy as np
import pytest

from blurr_tpu.parallel.pipeline import (
    PipelineCtx,
    make_pipeline_mesh,
    pipelined_scan,
)

L, B, D = 8, 4, 6


def _layer(packet, lp):
    h, const = packet
    return (jnp.tanh(h @ lp["w"] + lp["b"]) + const, const), None


@pytest.fixture(scope="module")
def toy():
    rng = np.random.RandomState(0)
    stacked = {
        "w": jnp.asarray(rng.randn(L, D, D) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(L, D) * 0.1, jnp.float32),
    }
    packet = (
        jnp.asarray(rng.randn(B, D), jnp.float32),
        jnp.asarray(rng.randn(B, D), jnp.float32),
    )
    return packet, stacked


@pytest.mark.parametrize(
    "stages,data,micro",
    [(2, 1, None), (4, 1, None), (2, 1, 4), (4, 1, 2),
     (2, 2, None), (4, 2, None), (2, 4, None)],
)
def test_pipelined_scan_matches_scan(toy, stages, data, micro):
    (h0, const), stacked = toy
    (h_ref, _), _ = jax.lax.scan(_layer, (h0, const), stacked)
    ctx = PipelineCtx(make_pipeline_mesh(stages, data=data), microbatches=micro)
    out = pipelined_scan(_layer, h0, stacked, ctx, consts=const)
    np.testing.assert_allclose(np.asarray(out), np.asarray(h_ref), rtol=1e-6)


def test_pipelined_scan_without_consts(toy):
    """The consts-free form: the whole packet rotates (carry-only layers)."""
    (h0, _), stacked = toy

    def layer(h, lp):
        return jnp.tanh(h @ lp["w"] + lp["b"]), None

    ref, _ = jax.lax.scan(layer, h0, stacked)
    out = pipelined_scan(layer, h0, stacked, PipelineCtx(make_pipeline_mesh(4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_microbatch_default_handles_odd_batches():
    """B=6 on 4 stages: M=min(S,B)=4 does not divide 6 — the default must
    fall back to the largest valid divisor (3), not crash."""
    rng = np.random.RandomState(2)
    stacked = {"w": jnp.asarray(rng.randn(8, 3, 3) * 0.3, jnp.float32),
               "b": jnp.zeros((8, 3), jnp.float32)}
    h0 = jnp.asarray(rng.randn(6, 3), jnp.float32)

    def layer(h, lp):
        return jnp.tanh(h @ lp["w"] + lp["b"]), None

    ref, _ = jax.lax.scan(layer, h0, stacked)
    out = pipelined_scan(layer, h0, stacked, PipelineCtx(make_pipeline_mesh(4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("stages,data", [(4, 1), (2, 2)])
def test_pipelined_scan_gradients_match(toy, stages, data):
    """ppermute's transpose is the reverse rotation; bubble compute must
    contribute exact zero cotangents (finite garbage, masked outputs).
    With a 'data' axis the stage-weight grads additionally psum over it
    (the shard_map transpose of the 'data'-replicated weights)."""
    (h0, const), stacked = toy

    def loss_scan(st):
        (h, _), _ = jax.lax.scan(_layer, (h0, const), st)
        return jnp.sum(h**2)

    ctx = PipelineCtx(make_pipeline_mesh(stages, data=data))

    def loss_pp(st):
        h = pipelined_scan(_layer, h0, st, ctx, consts=const)
        return jnp.sum(h**2)

    g_ref = jax.grad(loss_scan)(stacked)
    g_pp = jax.grad(loss_pp)(stacked)
    for r, o in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=2e-5,
                                   atol=1e-6)


def test_stage_count_one_falls_back_to_scan(toy):
    (h0, const), stacked = toy
    ctx = PipelineCtx(make_pipeline_mesh(1))
    (h_ref, _), _ = jax.lax.scan(_layer, (h0, const), stacked)
    out = pipelined_scan(_layer, h0, stacked, ctx, consts=const)
    np.testing.assert_allclose(np.asarray(out), np.asarray(h_ref))


@pytest.fixture(scope="module")
def pp_model():
    from blurr_tpu.models.pi0.pizero import PiZero
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    cfg["joint"]["config"]["num_hidden_layers"] = 4  # divisible by 2 and 4
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _flow_inputs(model):
    from tests.util import tiny_inputs

    rng = np.random.RandomState(1)
    inputs = tiny_inputs(model.cfg)
    bsz = inputs["input_ids"].shape[0]
    h, a = model.cfg.horizon_steps, model.cfg.action_dim
    return dict(
        input_ids=inputs["input_ids"],
        attention_mask=inputs["attention_mask"],
        pixel_values=inputs["pixel_values"],
        proprios=inputs["proprios"],
        actions=jnp.asarray(rng.randn(bsz, h, a), jnp.float32),
        t=jnp.asarray(rng.rand(bsz), jnp.float32),
        x0=jnp.asarray(rng.randn(bsz, h, a), jnp.float32),
    )


@pytest.mark.parametrize(
    "stages,data,remat", [(2, 1, False), (4, 1, False), (2, 2, False),
                          (2, 1, True)],
)
def test_pp_flow_loss_and_grads_match(pp_model, stages, data, remat):
    """flow_loss through the pipelined joint scan equals the plain scan —
    value and parameter gradients (the training contract); (2, 2) runs
    DP×PP on a ('data','pipe') mesh, and the remat case covers the
    production combination --pp --remat (jax.checkpoint around the staged
    layer body inside shard_map)."""
    model, params = pp_model
    kw = _flow_inputs(model)
    ctx = PipelineCtx(make_pipeline_mesh(stages, data=data))

    def loss(p, pipeline):
        return model.flow_loss(p, remat=remat, pipeline=pipeline, **kw)

    l_ref, g_ref = jax.value_and_grad(loss)(params, None)
    l_pp, g_pp = jax.value_and_grad(loss)(params, ctx)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_p, _ = jax.tree.flatten(g_pp)
    for r, o in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=5e-4, atol=1e-5
        )


def test_pp_train_step_matches_unpipelined(pp_model):
    """One masked-adamw step with pipeline=ctx equals the plain step."""
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step

    model, params = pp_model
    kw = _flow_inputs(model)
    batch = {
        "input_ids": kw["input_ids"],
        "attention_mask": kw["attention_mask"],
        "pixel_values": kw["pixel_values"],
        "proprios": kw["proprios"],
        "actions": kw["actions"],
    }
    ctx = PipelineCtx(make_pipeline_mesh(2))
    results = []
    for pipeline in (None, ctx):
        tx = masked_freeze(optax.adamw(1e-3), action_expert_mask(params))
        step = make_optax_train_step(model, tx, pipeline=pipeline)
        p1, _, loss = step(params, tx.init(params), batch, jax.random.PRNGKey(0))
        results.append((float(loss), p1))
    (l0, p0), (l1, p1) = results
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for r, o in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=5e-4, atol=1e-5
        )
