"""Mesh parallelism: TP-sharded inference equivalence + sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.utils.optim import masked_freeze

from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from blurr_tpu.parallel.train import dryrun_multichip, make_train_step
from tests.util import tiny_inputs, tiny_pi0_cfg


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    return model, params


def test_tp_sharded_inference_matches_single_device(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    ref = np.asarray(model.infer_action(params, **inputs))

    mesh = make_mesh(data=1, model=2)
    sharded = shard_params(params, mesh)
    with mesh:
        out = np.asarray(jax.jit(model.infer_action)(sharded, **inputs))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)


def test_dp_tp_sharded_inference(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)  # batch 2
    ref = np.asarray(model.infer_action(params, **inputs))
    mesh = make_mesh(data=2, model=2)
    sharded = shard_params(params, mesh)
    bsh = batch_sharding(mesh)
    sharded_inputs = {k: jax.device_put(v, bsh) for k, v in inputs.items()}
    with mesh:
        out = np.asarray(jax.jit(model.infer_action)(sharded, **sharded_inputs))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)


def test_train_step_decreases_loss(model_and_params):
    model, params = model_and_params
    rng = np.random.RandomState(0)
    inputs = tiny_inputs(model.cfg)
    batch = {
        "input_ids": inputs["input_ids"],
        "attention_mask": inputs["attention_mask"],
        "pixel_values": inputs["pixel_values"],
        "proprios": inputs["proprios"],
        "actions": jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
        "t": jnp.asarray([0.2, 0.7], jnp.float32),
        "x0": inputs["noise"],
    }
    step = make_train_step(model, learning_rate=1e-2)
    p1, l1 = step(params, batch)
    p2, l2 = step(p1, batch)
    _, l3 = step(p2, batch)
    assert float(l3) < float(l1)


def test_dryrun_multichip_8():
    out = dryrun_multichip(8)
    assert np.isfinite(out["loss"])
    assert out["infer_ok"]  # TP+DP-sharded infer_action on the 8-device mesh
    # 4x2 sharded loss/actions proven equal to a single-device run in-call
    assert out["matches_single_device"]
    # pipeline-parallel flow loss proven equal to the plain scan in-call
    assert out["pipeline_parallel_ok"]
    # sequence-parallel flow loss proven equal to the plain scan in-call
    assert out["sequence_parallel_ok"]
    # QLoRA (w8a8 base + LoRA factors) sharded CE step proven equal in-call
    assert out["qlora_openvla_ok"]


def test_trainable_masks(model_and_params):
    from blurr_tpu.models.pi0.trainable import (
        action_expert_mask,
        all_trainable_mask,
        frozen_mask,
        vlm_mask,
    )

    model, params = model_and_params
    m = action_expert_mask(params)
    assert m["joint"]["action"]["q_w"] is True or m["joint"]["action"]["q_w"]
    assert not m["joint"]["vlm"]["q_w"]
    assert m["action_decoder"]["w"]
    v = vlm_mask(params)
    assert v["joint"]["vlm"]["q_w"] and not v["joint"]["action"]["q_w"]
    assert all(jax.tree.leaves(all_trainable_mask(params)))
    assert not any(jax.tree.leaves(frozen_mask(params)))


def test_openvla_tp_sharded_inference_matches():
    from blurr_tpu.models.openvla.model import EMPTY_TOKEN, OpenVLA, OpenVLASpec

    spec = OpenVLASpec.tiny()
    model = OpenVLA(spec)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    ids = jnp.asarray(np.array([[1, 100, 200, EMPTY_TOKEN]], np.int32))
    img = jnp.asarray(rng.rand(1, 6, 28, 28).astype(np.float32))
    ref = np.asarray(model.predict_action_tokens(params, ids, img))

    mesh = make_mesh(data=1, model=2)
    sharded = shard_params(params, mesh)
    with mesh:
        out = np.asarray(jax.jit(model.predict_action_tokens)(sharded, ids, img))
    np.testing.assert_array_equal(out, ref)


def test_tp_sharding_reduces_per_device_weight_bytes(model_and_params):
    """Compile-level multi-chip perf evidence (no hardware needed): the TP=2
    program's per-device argument footprint must be materially below the
    replicated single-device program's — the mixture Q/MLP weights, embed
    table, and SigLIP layers split over the 'model' axis, which is what
    halves the weight-bandwidth floor on a real 2-chip slice."""
    from blurr_tpu.utils.monitor import compiled_hbm_gb

    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)

    single = jax.jit(model.infer_action).lower(params, **inputs).compile()
    s1 = compiled_hbm_gb(single)

    mesh = make_mesh(data=1, model=2)
    sharded = shard_params(params, mesh)
    with mesh:
        tp = jax.jit(model.infer_action).lower(sharded, **inputs).compile()
        s2 = compiled_hbm_gb(tp)
    assert s1.get("argument_gb", 0) > 0
    # per-device argument bytes: sharded leaves contribute half; replicated
    # leaves (norms, K/V, small encoders) keep the ratio above 0.5
    ratio = s2["argument_gb"] / s1["argument_gb"]
    assert ratio < 0.85, f"TP=2 args/device ratio {ratio:.3f} (expected < 0.85)"


def _masked_adamw_step(model, params):
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step

    tx = masked_freeze(optax.adamw(1e-3), action_expert_mask(params))
    return make_optax_train_step(model, tx), tx.init(params)


@pytest.fixture(scope="module")
def model_and_canon_params(model_and_params):
    """Training-canonical form of the tied tree (proprio mixture -> None,
    resolved to the action weights in the forward) — what every training
    path must use."""
    model, params = model_and_params
    return model, model.canonicalize_tied_weights(params)


def _train_batch(model, bsz: int = 2):
    rng = np.random.RandomState(0)
    inputs = tiny_inputs(model.cfg)
    batch = {
        "input_ids": inputs["input_ids"],
        "attention_mask": inputs["attention_mask"],
        "pixel_values": inputs["pixel_values"],
        "proprios": inputs["proprios"],
        "actions": jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
    }
    if bsz > 2:  # tile up so the batch splits over a wider 'data' axis
        reps = bsz // 2
        batch = {
            k: jnp.tile(v, (reps,) + (1,) * (v.ndim - 1)) for k, v in batch.items()
        }
    return batch


def test_shard_params_preserves_weight_tying_and_mask(model_and_params):
    """Regression: tree.map(device_put) used to break the action<->proprio
    leaf aliasing, which action_expert_mask detects — sharded training
    silently froze the tied proprio mixture that unsharded training updates
    (masks differed between `--dp 1` and `--dp 2` runs of the same config)."""
    from blurr_tpu.models.pi0.trainable import action_expert_mask

    model, params = model_and_params
    assert params["joint"]["proprio"]["v_w"] is params["joint"]["action"]["v_w"]
    mesh = make_mesh(data=2, model=1)
    sharded = shard_params(params, mesh)
    assert sharded["joint"]["proprio"]["v_w"] is sharded["joint"]["action"]["v_w"]
    m = action_expert_mask(sharded)
    assert m["joint"]["proprio"]["v_w"], (
        "tied proprio mixture must stay trainable after sharding"
    )


@pytest.mark.parametrize("data,model_par", [(2, 1), (2, 2), (4, 2)])
def test_fsdp_train_step_matches_single_device(
    model_and_canon_params, data, model_par
):
    """ZeRO-3-style FSDP (weights + adamw moments sharded over 'data',
    GSPMD all-gather/reduce-scatter) is a memory layout, not a different
    optimizer: loss and updated params must match the unsharded step, and
    the updated params must STILL be FSDP-sharded (a training loop must not
    degrade to replicated after step 1)."""
    model, params = model_and_canon_params
    batch = _train_batch(model, bsz=max(2, data))
    key = jax.random.PRNGKey(42)

    step, opt_state = _masked_adamw_step(model, params)
    p_ref, _, loss_ref = step(params, opt_state, batch, key)

    mesh = make_mesh(data=data, model=model_par)
    sharded = shard_params(params, mesh, fsdp=True)
    bsh = batch_sharding(mesh)
    sbatch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    step_s, opt_state_s = _masked_adamw_step(model, sharded)
    with mesh:
        p_s, _, loss_s = step_s(sharded, opt_state_s, sbatch, key)
    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=5e-4)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_s)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )
    gate = p_s["joint"]["vlm"]["gate_w"]
    assert "data" in tuple(gate.sharding.spec), (
        f"updated params lost the FSDP sharding: {gate.sharding.spec}"
    )
    # [L, H, I] with 'data' on H: each device holds H/data rows
    assert gate.addressable_shards[0].data.shape[1] * data == gate.shape[1]


def test_fsdp_reduces_per_device_state_bytes(model_and_canon_params):
    """Compile-level evidence for the FSDP memory claim: the per-device
    argument footprint (params + adamw moments + batch) of the fsdp=True
    train step at data=2 must be materially below plain DP's (which
    replicates all weights and moments). Measured ratio ~0.51 on the tiny
    tree; threshold leaves slack for replicated stragglers."""
    from blurr_tpu.utils.monitor import compiled_hbm_gb

    model, params = model_and_canon_params
    batch = _train_batch(model)
    key = jax.random.PRNGKey(42)
    mesh = make_mesh(data=2, model=1)
    bsh = batch_sharding(mesh)
    sbatch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    sizes = {}
    for fsdp in (False, True):
        sharded = shard_params(params, mesh, fsdp=fsdp)
        step, opt_state = _masked_adamw_step(model, sharded)
        with mesh:
            compiled = jax.jit(step).lower(
                sharded, opt_state, sbatch, key
            ).compile()
        sizes[fsdp] = compiled_hbm_gb(compiled).get("argument_gb", 0)
    assert sizes[False] > 0
    ratio = sizes[True] / sizes[False]
    assert ratio < 0.65, f"FSDP args/device ratio {ratio:.3f} (expected < 0.65)"


def test_remat_flow_loss_and_grads_match(model_and_params):
    """jax.checkpoint around the scanned joint layer changes memory, never
    math: loss and grads must match the non-remat path."""
    model, params = model_and_params
    rng = np.random.RandomState(1)
    inputs = tiny_inputs(model.cfg)
    args = (
        inputs["input_ids"], inputs["attention_mask"],
        inputs["pixel_values"], inputs["proprios"],
        jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
        jnp.asarray([0.2, 0.7], jnp.float32),
        inputs["noise"],
    )

    def loss(p, remat):
        return model.flow_loss(p, *args, remat=remat)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_accum_steps_matches_full_batch_gradient(model_and_params):
    """optax.MultiSteps(k=2) over two micro-batches applies ONE adamw update
    with the averaged gradient — identical to a manual masked-adamw step on
    mean(g1, g2); parameters must hold still until the k-th micro-step."""
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step

    model, params = model_and_params
    params = model.canonicalize_tied_weights(params)
    rng = np.random.RandomState(2)
    inputs = tiny_inputs(model.cfg)

    def microbatch(seed):
        r = np.random.RandomState(seed)
        return {
            "input_ids": inputs["input_ids"],
            "attention_mask": inputs["attention_mask"],
            "pixel_values": inputs["pixel_values"],
            "proprios": inputs["proprios"],
            "actions": jnp.asarray(r.randn(2, 4, 7).astype(np.float32)),
        }

    mask = action_expert_mask(params)
    inner = masked_freeze(optax.adamw(1e-3), mask)
    tx = optax.MultiSteps(inner, every_k_schedule=2)
    opt_state = tx.init(params)
    step = make_optax_train_step(model, tx)

    b1, b2 = microbatch(10), microbatch(11)
    k1, k2 = jax.random.PRNGKey(100), jax.random.PRNGKey(101)
    p_mid, opt_state, _ = step(params, opt_state, b1, k1)
    # micro-step 1 of 2: accumulate only, params frozen
    for a, b in zip(jax.tree.leaves(p_mid), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_acc, opt_state, _ = step(p_mid, opt_state, b2, k2)

    # manual reference: replicate the step's in-step noise/t sampling
    # (parallel/train.py make_optax_train_step), average the two grads,
    # apply ONE masked adamw update
    def grad_for(batch, key):
        ka, kb = jax.random.split(key)
        noise = jax.random.normal(ka, batch["actions"].shape, jnp.float32)
        t = jax.random.beta(kb, 1.5, 1.0, (batch["actions"].shape[0],))
        return jax.grad(
            lambda p: model.flow_loss(
                p, batch["input_ids"], batch["attention_mask"],
                batch["pixel_values"], batch["proprios"], batch["actions"],
                t, noise,
            )
        )(params)

    g = jax.tree.map(
        lambda a, b: (a + b) / 2.0, grad_for(b1, k1), grad_for(b2, k2)
    )
    ref_state = inner.init(params)
    updates, _ = inner.update(g, ref_state, params)
    p_ref = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Tied-weight training semantics (canonical form)
# ---------------------------------------------------------------------------


def test_canonicalize_tied_weights_roundtrip(model_and_params):
    """Tied tree -> canonical (proprio None); untied tree passes through;
    tie() on a canonical tree restores the aliased inference form."""
    model, params = model_and_params
    canon = model.canonicalize_tied_weights(params)
    assert canon["joint"]["proprio"] is None
    # untied: unchanged
    untied = model.init_params(jax.random.PRNGKey(1))
    assert model.canonicalize_tied_weights(untied) is untied
    retied = model.tie_action_proprio_weights(canon)
    assert retied["joint"]["proprio"] is retied["joint"]["action"]


def test_canonical_inference_matches_tied(model_and_params):
    """proprio=None resolves to the action weights in every forward path:
    actions must be bit-identical to the aliased tied tree's."""
    model, params = model_and_params
    canon = model.canonicalize_tied_weights(params)
    inputs = tiny_inputs(model.cfg)
    ref = np.asarray(model.infer_action(params, **inputs))
    out = np.asarray(model.infer_action(canon, **inputs))
    np.testing.assert_array_equal(out, ref)
    naive_ref = np.asarray(model.infer_action_naive(params, **inputs))
    naive = np.asarray(model.infer_action_naive(canon, **inputs))
    np.testing.assert_array_equal(naive, naive_ref)


def test_tied_gradients_sum_into_action_leaves(model_and_params):
    """THE tied-training semantics check (torch shared Parameter): the
    canonical tree's action-mixture gradient must equal the SUM of the
    aliased tree's separate proprio + action partial gradients."""
    model, params = model_and_params
    canon = model.canonicalize_tied_weights(params)
    rng = np.random.RandomState(3)
    inputs = tiny_inputs(model.cfg)
    args = (
        inputs["input_ids"], inputs["attention_mask"],
        inputs["pixel_values"], inputs["proprios"],
        jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
        jnp.asarray([0.3, 0.6], jnp.float32),
        inputs["noise"],
    )
    g_alias = jax.grad(lambda p: model.flow_loss(p, *args))(params)
    g_canon = jax.grad(lambda p: model.flow_loss(p, *args))(canon)
    assert g_canon["joint"]["proprio"] is None
    for k in g_canon["joint"]["action"]:
        summed = jax.tree.map(
            lambda a, b: a + b,
            g_alias["joint"]["proprio"][k],
            g_alias["joint"]["action"][k],
        )
        for a, b in zip(
            jax.tree.leaves(summed), jax.tree.leaves(g_canon["joint"]["action"][k])
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6
            )


def test_optax_step_rejects_aliased_tree(model_and_params):
    """Training on the raw tied tree silently breaks the tie (each alias
    gets a partial gradient) — the step must refuse it up front."""
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step

    model, params = model_and_params
    tx = masked_freeze(optax.adamw(1e-3), action_expert_mask(params))
    step = make_optax_train_step(model, tx)
    batch = _train_batch(model)
    with pytest.raises(ValueError, match="aliased leaves"):
        step(params, tx.init(params), batch, jax.random.PRNGKey(0))


def test_canonical_step_trains_and_donates(model_and_canon_params):
    """One donated masked-adamw step on the canonical tree: proprio stays
    None (one moment set), the action mixture actually moves, and the tie
    survives re-expansion for inference.

    Donation CONSUMES the input buffers (honored on CPU too), so this test
    must work on a private copy — donating the module-scoped fixture's
    arrays would delete them for every later test."""
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step

    model, params = model_and_canon_params
    params = jax.tree.map(jnp.array, params)  # private copy: donation consumes
    mask = action_expert_mask(params)
    assert mask["joint"]["proprio"] is None
    tx = masked_freeze(optax.adamw(1e-3), mask)
    opt_state = tx.init(params)
    step = make_optax_train_step(model, tx, donate=True)
    before = np.asarray(params["joint"]["action"]["q_w"]).copy()
    p1, opt_state, loss = step(
        params, opt_state, _train_batch(model), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))
    assert p1["joint"]["proprio"] is None
    assert np.abs(np.asarray(p1["joint"]["action"]["q_w"]) - before).max() > 0
    retied = model.tie_action_proprio_weights(p1)
    assert retied["joint"]["proprio"] is retied["joint"]["action"]


def test_bf16_params_accept_fp32_batch(model_and_canon_params):
    """Data loaders hand back fp32 batches; with bf16 weights the step must
    cast the float leaves to the weight dtype instead of failing to trace
    (fp32 creep through the action mixture flips the joint layer-scan carry
    dtype — the exact failure experiments/train_throughput.py first hit)."""
    model, params = model_and_canon_params
    bf16 = jax.tree.map(
        lambda l: l.astype(jnp.bfloat16)
        if jnp.issubdtype(l.dtype, jnp.floating)
        else l,
        params,
    )
    step, opt_state = _masked_adamw_step(model, bf16)
    batch = _train_batch(model)  # fp32 floats, as a real loader produces
    assert batch["actions"].dtype == jnp.float32
    p1, _, loss = step(bf16, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert p1["joint"]["action"]["q_w"].dtype == jnp.bfloat16


def test_w4a8_tp_sharding_rules(model_and_params):
    """TP rule consistency across the three quant-dict formats: w8a8 scales
    are per-output-channel ([L, out], sharded with the weight's out axis);
    w4a8 packed weights [L, NB, K//2, BN] COLUMN-shard on the NB block axis
    whenever the parent is TP-sharded at all (row-parallel parents included
    — sharding the contraction dim would split a group's int32 accumulation
    across chips) and their group scales [L, G, N] split on the exact-N
    axis alongside the blocks."""
    from jax.sharding import PartitionSpec as P

    from blurr_tpu.ops.quant import quantize_mixture_w4a8, quantize_mixture_w8a8
    from blurr_tpu.parallel.mesh import pi0_param_sharding

    model, params = model_and_params
    mesh = make_mesh(data=1, model=2)

    p8 = dict(params)
    p8["joint"] = dict(params["joint"])
    p8["joint"]["vlm"] = quantize_mixture_w8a8(params["joint"]["vlm"])
    sh8 = pi0_param_sharding(p8, mesh)
    assert sh8["joint"]["vlm"]["q_w"]["s"].spec == P(None, "model")
    assert sh8["joint"]["vlm"]["q_w"]["q8a"].spec == P(None, None, "model")

    p4 = dict(params)
    p4["joint"] = dict(params["joint"])
    p4["joint"]["vlm"] = quantize_mixture_w4a8(params["joint"]["vlm"])
    sh4 = pi0_param_sharding(p4, mesh)
    for key in ("q_w", "o_w", "gate_w", "down_w"):  # column AND row parents
        assert sh4["joint"]["vlm"][key]["q4"].spec == P(
            None, "model", None, None), key
        assert sh4["joint"]["vlm"][key]["s"].spec == P(None, None, "model"), key


def test_repack_w4a8_lossless_and_divisible():
    """repack_w4a8 re-lays the block-major packing for t-way TP without
    touching a single int4 value: the dequantized weight is bit-identical
    and the new NB axis divides the shard count. Stacked [L, ...] leaves
    repack per layer; an already-divisible layout returns unchanged."""
    from blurr_tpu.ops.quant import (
        _w4a8_deq,
        quantize_weight_w4a8,
        repack_w4a8,
        repack_w4a8_tree,
    )

    rng = np.random.RandomState(0)
    k, n = 256, 384  # awkward width: single-chip layout pads 384 -> bn=128x3
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    q = quantize_weight_w4a8(w, group_size=128)
    ref = _w4a8_deq(q["q4"], q["s"], k)
    for t in (2, 4, 8):
        r = repack_w4a8(q, t)
        assert r["q4"].shape[-3] % t == 0, (t, r["q4"].shape)
        np.testing.assert_array_equal(_w4a8_deq(r["q4"], r["s"], k), ref)
    # stacked tree walk: repacks q4 dicts, leaves others aliased
    stacked = {"a": {"q4": jnp.stack([q["q4"]] * 3), "s": jnp.stack([q["s"]] * 3)},
               "b": {"w": w}}
    out = repack_w4a8_tree(stacked, 8)
    assert out["b"] is stacked["b"]
    assert out["a"]["q4"].shape[-3] % 8 == 0
    np.testing.assert_array_equal(
        _w4a8_deq(out["a"]["q4"][1], out["a"]["s"][1], k), ref)
    same = quantize_weight_w4a8(w, group_size=128, shards=8)
    assert repack_w4a8_tree({"x": same}, 8)["x"] is same  # no-op path


def test_int4_matmul_spmd_tp_matches_unsharded():
    """The Pallas int4 kernel's GSPMD rule (interpret mode on the 8-device
    CPU mesh): column-sharding the packed weight on NB runs the UNCHANGED
    kernel per shard on its own contiguous blocks and the result equals the
    single-device kernel exactly (integer arithmetic — zero tolerance)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from blurr_tpu.ops.pallas_int4_matmul import (
        int4_matmul,
        int4_matmul_spmd,
        pack_int4,
        pick_block_layout,
        to_block_major,
    )

    rng = np.random.RandomState(1)
    m, k, n, g = 8, 256, 512, 4
    x = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    bn, n_pad = pick_block_layout(n, shards=8)
    qcols = np.pad(rng.randint(-8, 8, (k, n)).astype(np.int8),
                   ((0, 0), (0, n_pad - n)))
    packed = to_block_major(pack_int4(jnp.asarray(qcols)), bn)
    scale = jnp.asarray(rng.rand(g, n_pad).astype(np.float32))
    ref = int4_matmul(x, packed, scale, interpret=True)

    mesh = make_mesh(data=1, model=8)
    ps = jax.device_put(packed, NamedSharding(mesh, P("model", None, None)))
    ss = jax.device_put(scale, NamedSharding(mesh, P(None, "model")))
    y = jax.jit(
        lambda a, b, c: int4_matmul_spmd(a, b, c, interpret=True)
    )(x, ps, ss)
    assert "model" in y.sharding.spec
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


# ---------------------------------------------------------------------------
# Sequence parallelism (GSPMD SP over a 'seq' mesh axis) — new design, the
# reference has no sequence scaling (SURVEY.md §5)
# ---------------------------------------------------------------------------


def _flow_args(model, rng_seed=1):
    rng = np.random.RandomState(rng_seed)
    inputs = tiny_inputs(model.cfg)
    return (
        inputs["input_ids"], inputs["attention_mask"],
        inputs["pixel_values"], inputs["proprios"],
        jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
        jnp.asarray([0.2, 0.7], jnp.float32),
        inputs["noise"],
    )


def test_sp_flow_loss_and_grads_match(model_and_params):
    """Sequence-sharding the vlm/SigLIP token axis is a layout annotation,
    never math: loss and grads on a ('data'=1,'seq'=2) mesh must equal the
    unsharded run."""
    model, params = model_and_params
    args = _flow_args(model)

    l0, g0 = jax.value_and_grad(lambda p: model.flow_loss(p, *args))(params)

    mesh = make_mesh(data=1, seq=2)
    sharded = shard_params(params, mesh)
    with mesh:
        l1, g1 = jax.jit(
            jax.value_and_grad(
                lambda p: model.flow_loss(p, *args, sp_axis="seq")
            )
        )(sharded)
        jax.block_until_ready(l1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_sp_composes_with_dp_and_remat(model_and_params):
    """SP x DP on a (2, 2, 1) mesh with rematerialized layers: the full
    composition the train CLI wires (--dp 2 --sp 2 --remat)."""
    model, params = model_and_params
    args = _flow_args(model, rng_seed=2)

    l0 = float(model.flow_loss(params, *args))

    mesh = make_mesh(data=2, seq=2)
    sharded = shard_params(params, mesh)
    bsh = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bsh) for a in args[:5]) + (
        jax.device_put(args[5], bsh), jax.device_put(args[6], bsh))
    with mesh:
        l1 = jax.jit(
            lambda p, *a: model.flow_loss(p, *a, sp_axis="seq", remat=True)
        )(sharded, *sh_args)
        l1 = float(l1)
    np.testing.assert_allclose(l1, l0, rtol=5e-5)


def test_sp_compile_shards_sequence_axis(model_and_params):
    """Compile-level evidence that SP actually shards: the lowered program
    carries a device assignment splitting dimension 1 (tokens) across the
    2-device 'seq' axis."""
    model, params = model_and_params
    args = _flow_args(model, rng_seed=3)
    mesh = make_mesh(data=1, seq=2)
    sharded = shard_params(params, mesh)
    with mesh:
        txt = (
            jax.jit(lambda p, *a: model.flow_loss(p, *a, sp_axis="seq"))
            .lower(sharded, *args)
            .as_text()
        )
    # Shardy renders P(None,'seq',None) as sdy.sharding_constraint
    # [{}, {"seq"}, {}]; legacy GSPMD as a @Sharding custom-call with
    # devices=[1,2,1]
    assert ('sdy.sharding_constraint' in txt and '{"seq"}' in txt) or (
        "devices=[1,2,1]" in txt
    ), "no token-axis sharding in lowered HLO"


def test_sp_rejects_pipeline_combination(model_and_params):
    model, params = model_and_params
    args = _flow_args(model)

    class _FakePipe:  # naive_forward only checks for non-None
        pass

    with pytest.raises(ValueError, match="sequence parallelism"):
        model.flow_loss(params, *args, sp_axis="seq", pipeline=_FakePipe())


def test_sp_composes_with_fsdp(model_and_params):
    """--fsdp --sp 2 --dp 2: weights (and downstream moments) shard over
    'data' while activations token-shard over 'seq'; the loss must still
    equal the unsharded run."""
    model, params = model_and_params
    params = model.canonicalize_tied_weights(params)
    args = _flow_args(model, rng_seed=4)
    l0 = float(model.flow_loss(params, *args))

    mesh = make_mesh(data=2, seq=2)
    sharded = shard_params(params, mesh, fsdp=True)
    bsh = batch_sharding(mesh)
    sh_args = tuple(jax.device_put(a, bsh) for a in args)
    with mesh:
        l1 = float(
            jax.jit(lambda p, *a: model.flow_loss(p, *a, sp_axis="seq"))(
                sharded, *sh_args
            )
        )
    np.testing.assert_allclose(l1, l0, rtol=5e-5)


def test_params_ema_tracks_post_update_weights(model_and_canon_params):
    """params_ema chained after the masked optimizer: the opt_state-resident
    EMA equals the bias-corrected recurrence over the actual post-update
    parameter trajectory, and extract_ema pulls it out of the full chain
    (incl. through MultiSteps-style nesting of tuples)."""
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step
    from blurr_tpu.utils.optim import extract_ema, params_ema

    model, params = model_and_canon_params
    decay = 0.9
    tx = optax.chain(
        masked_freeze(optax.adamw(1e-2), action_expert_mask(params)),
        params_ema(decay),
    )
    opt_state = tx.init(params)
    step = make_optax_train_step(model, tx)
    batch = _train_batch(model)

    history = [params]
    p = params
    for i in range(3):
        p, opt_state, _ = step(p, opt_state, batch, jax.random.PRNGKey(i))
        history.append(p)

    # manual bias-corrected recurrence over the post-update trees
    ref = jax.tree.map(np.asarray, history[0])
    for c, post in enumerate(history[1:], start=1):
        d = min(decay, (1.0 + c) / (10.0 + c))
        ref = jax.tree.map(
            lambda e, q: d * e + (1 - d) * np.asarray(q, np.float32), ref, post
        )
    ema = extract_ema(opt_state)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(ema)):
        np.testing.assert_allclose(np.asarray(b, np.float32), a,
                                   rtol=2e-6, atol=2e-7)


def test_masked_freeze_pins_frozen_groups(model_and_canon_params):
    """REGRESSION (found by the LoRA-training work): bare ``optax.masked``
    is documented to pass masked-out updates through UNCHANGED, so the raw
    VLM gradients were being ADDED to the "frozen" weights (gradient ascent
    on the frozen group). ``masked_freeze`` must keep every non-trainable
    leaf bitwise unchanged while the trainable group moves."""
    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask
    from blurr_tpu.parallel.train import make_optax_train_step

    model, params = model_and_canon_params
    mask = action_expert_mask(params)
    tx = masked_freeze(optax.adamw(1e-3), mask)
    opt_state = tx.init(params)
    step = make_optax_train_step(model, tx)
    p1, _, loss = step(
        params, opt_state, _train_batch(model), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))
    moved = frozen_moved = 0
    for a, b, m in zip(jax.tree.leaves(params), jax.tree.leaves(p1),
                       jax.tree.leaves(mask)):
        same = bool(jnp.array_equal(a, b))
        if m and not same:
            moved += 1
        if not m and not same:
            frozen_moved += 1
    assert frozen_moved == 0, f"{frozen_moved} frozen leaves changed"
    assert moved > 0
