"""Sharded flow-matching training step.

The reference keeps a training ``forward`` (flow loss) but no distributed
training (SURVEY.md §0, §2.7). Here the loss is differentiable end-to-end and
the step function composes with a ('data', 'model') mesh: parameters carry TP
NamedShardings, the batch is DP-sharded, and GSPMD inserts the ICI
collectives (psum for the grad all-reduce, all-gathers at TP boundaries).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params


def _cast_batch_to_param_dtype(params, batch: Dict) -> Dict:
    """Cast floating batch leaves to the weights' dtype.

    Data loaders hand back fp32 arrays; with bf16 weights an uncast batch
    leaks fp32 into the action mixture and flips the joint layer-scan carry
    dtype — the step then fails to trace. Integer leaves (input_ids,
    attention_mask) pass through untouched. fp32 params + bf16 batch upcasts,
    which is equally correct.
    """
    wdtype = next(
        l.dtype
        for l in jax.tree.leaves(params)
        if jnp.issubdtype(l.dtype, jnp.inexact)
    )
    return {
        k: v.astype(wdtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
        for k, v in batch.items()
    }


def make_train_step(model: PiZero, learning_rate: float = 1e-4):
    def loss_fn(params, batch):
        return model.flow_loss(
            params,
            batch["input_ids"],
            batch["attention_mask"],
            batch["pixel_values"],
            batch["proprios"],
            batch["actions"],
            batch["t"],
            batch["x0"],
        )

    # NOTE: donate_argnums=(0,) would halve the peak param memory, but only
    # for a canonical tree (PiZero.canonicalize_tied_weights) — an ALIASED
    # tied tree makes XLA reject donating the same buffer twice. This simple
    # SGD step is a test fixture; the production step below donates.
    @jax.jit
    def step(params, batch):
        batch = _cast_batch_to_param_dtype(params, batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        params = jax.tree.map(lambda p, g: p - learning_rate * g, params, grads)
        return params, loss

    return step


def make_optax_train_step(model: PiZero, tx, remat: bool = False,
                          donate: bool = False, pipeline=None,
                          sp_axis: str = None, compute_dtype=None):
    """The REAL training step: optax GradientTransformation (e.g.
    ``masked_freeze(optax.adamw(schedule), mask)`` — utils/optim.py; NOT
    bare optax.masked, which passes frozen grads through) with in-step noise/flow-time
    sampling (beta flow-time, cfg ``flow_sampling: beta``). This is the step
    scripts/train_pi0_flow.py runs and the driver's multichip dryrun
    validates — sharded params imply sharded adamw moments via GSPMD.

    ``params`` must be a TRAINING-CANONICAL tree for tied checkpoints
    (``PiZero.canonicalize_tied_weights``: tied proprio mixture -> None,
    resolved to the action weights inside the forward). Differentiating the
    ALIASED tied tree instead silently breaks the tie on the first update —
    each duplicate leaf gets only its own partial gradient, not the summed
    gradient a shared torch Parameter receives — so the step refuses aliased
    trees (checked once, before tracing).

    ``remat=True`` rematerializes each joint layer in the backward pass
    (``jax.checkpoint`` around the scanned layer body) — activation HBM
    drops from O(L) to O(1) layers at ~1/3 extra FLOPs, the standard trade
    for larger per-chip batches. Gradient ACCUMULATION composes at the tx
    level: wrap with ``optax.MultiSteps(tx, k)`` (scripts/train_pi0_flow.py
    ``--accum-steps``) — the step signature is unchanged.

    ``donate=True`` donates the params and opt_state buffers to XLA
    (in-place update): peak training HBM drops by ~one full params+moments
    copy. Requires the canonical tree (duplicate buffers cannot be donated
    twice); the caller must not reuse the donated inputs afterwards.

    ``pipeline`` (a ``parallel.pipeline.PipelineCtx``) stages the joint
    layer scan over the ctx's ('pipe',) mesh — microbatches rotate between
    stages via ppermute while each stage holds 1/S of the stacked joint
    weights (weights outside the joint stack stay replicated).

    ``sp_axis`` (mesh axis name, normally 'seq') turns on GSPMD sequence
    parallelism: SigLIP patch tokens and the vlm mixture's 277 tokens shard
    over that axis (see joint.naive_forward) — activation HBM and the
    norm/MLP work split 1/n per device, composing with 'data' and 'model'
    on a make_mesh(data, model, seq) mesh. Must be traced under the mesh.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) turns on MASTER-WEIGHT mixed
    precision: ``params`` stay in their own (fp32) dtype — that's what the
    optimizer updates and the moments live in — while the forward/backward
    run on a cast-to-``compute_dtype`` copy. Autodiff through the cast
    upcasts the cotangents, so tiny updates the bf16 grid would round away
    (|lr·g| < ulp(p)/2, the classic bf16-training stall) accumulate in the
    fp32 masters. Costs one transient bf16 param copy in the forward
    (+50% of the bf16 footprint); the copy inherits the masters' GSPMD
    shardings, so it composes with DP/TP/FSDP/SP/PP unchanged."""
    import optax

    def _cast_params(params):
        if compute_dtype is None:
            return params
        from blurr_tpu.utils.optim import cast_floating_preserving_scales

        # preserves quant-dict / lora_s scales in fp32 (dequant precision)
        return cast_floating_preserving_scales(params, compute_dtype)

    def loss_fn(params, batch, noise, t):
        return model.flow_loss(
            _cast_params(params),
            batch["input_ids"],
            batch["attention_mask"],
            batch["pixel_values"],
            batch["proprios"],
            batch["actions"],
            t,
            noise,
            remat=remat,
            pipeline=pipeline,
            sp_axis=sp_axis,
        )

    def step(params, opt_state, batch, key):
        if compute_dtype is not None:
            # the forward runs in compute_dtype; casting the batch to the
            # MASTER dtype would re-leak fp32 into the layer-scan carry
            batch = {
                k: v.astype(compute_dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in batch.items()
            }
        else:
            batch = _cast_batch_to_param_dtype(params, batch)
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, batch["actions"].shape, jnp.float32)
        t = jax.random.beta(k2, 1.5, 1.0, (batch["actions"].shape[0],))
        # QLoRA trees carry frozen int8 base weights (see
        # utils.optim.value_and_grad_frozen_int)
        from blurr_tpu.utils.optim import value_and_grad_frozen_int

        loss, grads = value_and_grad_frozen_int(loss_fn)(
            params, batch, noise, t
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jit_step = jax.jit(step, donate_argnums=(0, 1) if donate else ())
    checked = {"done": False}

    def guarded(params, opt_state, batch, key):
        if not checked["done"]:
            assert_no_aliased_leaves(params)
            checked["done"] = True
        return jit_step(params, opt_state, batch, key)

    guarded.lower = jit_step.lower  # AOT compile/memory-analysis access
    return guarded


def assert_no_aliased_leaves(params) -> None:
    """Refuse training on a tree with duplicate (aliased) array leaves: the
    gradient of each alias is only its own partial contribution, which is
    not shared-Parameter semantics. Convert with
    ``PiZero.canonicalize_tied_weights`` first. (Identity is only visible on
    concrete trees — this runs on the host, never under jit.)"""
    leaves = jax.tree.leaves(params)
    seen = {}
    for i, leaf in enumerate(leaves):
        j = seen.setdefault(id(leaf), i)
        if j != i:
            raise ValueError(
                "params tree has aliased leaves (e.g. "
                "tie_action_proprio_weights): training on the aliased tree "
                "silently breaks the tie and drops half of each tied leaf's "
                "gradient. Call PiZero.canonicalize_tied_weights(params) "
                "before training."
            )


def dryrun_multichip(n_devices: int, data: int = None, model_par: int = None):
    """Compile + execute the FULL multi-chip contract on tiny shapes over an
    ``n_devices`` mesh (driver contract: validates the multi-chip path
    without real chips, using virtual CPU devices):

    1. one sharded training step with the REAL optimizer path — masked optax
       adamw with sharded moments (the step scripts/train_pi0_flow.py runs);
    2. one TP+DP-sharded ``infer_action`` — the product's serving path;
    3. the SAME step and inference on a single device, asserting the sharded
       loss and actions match (a GSPMD partitioning bug at the wide mesh
       fails the driver check, not just finiteness — round-2 verdict Next #3).

    Returns {"loss": float, "infer_ok": bool, "matches_single_device": bool}.
    """
    import os

    import numpy as np

    # The axon plugin overrides JAX_PLATFORMS programmatically at import, so
    # the driver's env (JAX_PLATFORMS=cpu + xla_force_host_platform_device_
    # count) is NOT enough — force the virtual CPU platform and the device
    # count BEFORE the backend initializes (config.update is a no-op after).
    # Real multi-chip hardware can opt out via BLURR_DRYRUN_PLATFORM=tpu.
    platform = os.environ.get("BLURR_DRYRUN_PLATFORM", "cpu")
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} on platform "
        f"{devices[0].platform!r}. If the backend initialized before this "
        "call (e.g. jax.devices() was touched), run dryrun_multichip in a "
        "fresh process."
    )
    if model_par is None:
        model_par = 2 if n_devices % 2 == 0 else 1
    if data is None:
        data = n_devices // model_par

    from tests.util import tiny_pi0_cfg  # layer-reduced flagship dims

    cfg = tiny_pi0_cfg()
    # head/intermediate counts divisible by the model axis
    model = PiZero(cfg)
    mesh = make_mesh(data=data, model=model_par, devices=devices[:n_devices])

    # tied like production checkpoints (tie_action_proprio_weights), then
    # converted to the training-canonical form exactly as
    # scripts/train_pi0_flow.py does: the tied proprio mixture becomes None
    # and the forward resolves it to the action weights, so its gradient
    # SUMS into the action leaves (shared-Parameter semantics) instead of
    # silently breaking the tie on the first update
    params = model.canonicalize_tied_weights(
        model.tie_action_proprio_weights(model.init_params(jax.random.PRNGKey(0)))
    )
    params = shard_params(params, mesh)

    bsz = max(2, data)
    rng = np.random.RandomState(0)
    s_img = cfg.vision.config.num_image_tokens
    seq = cfg.max_image_text_tokens
    ids = np.zeros((bsz, seq), np.int32)
    am = np.zeros((bsz, seq), np.int32)
    ids[:, :s_img] = cfg.image_token_index
    ids[:, s_img : s_img + 4] = rng.randint(3, cfg.vocab_size, (bsz, 4))
    am[:, : s_img + 4] = 1
    img = cfg.vision.config.image_size
    bsh = batch_sharding(mesh)
    batch = {
        "input_ids": jax.device_put(jnp.asarray(ids), bsh),
        "attention_mask": jax.device_put(jnp.asarray(am), bsh),
        "pixel_values": jax.device_put(
            jnp.asarray(rng.rand(bsz, 3, img, img), jnp.float32), bsh
        ),
        "proprios": jax.device_put(
            jnp.asarray(rng.randn(bsz, cfg.cond_steps, cfg.proprio_dim), jnp.float32),
            bsh,
        ),
        "actions": jax.device_put(
            jnp.asarray(
                rng.randn(bsz, cfg.horizon_steps, cfg.action_dim), jnp.float32
            ),
            bsh,
        ),
    }

    import optax

    from blurr_tpu.models.pi0.trainable import action_expert_mask

    with mesh:
        # real optimizer path: masked adamw with warmup-cosine schedule; the
        # opt state is initialized AFTER sharding so the moments inherit the
        # params' NamedShardings (scripts/train_pi0_flow.py:154-163)
        from blurr_tpu.utils.optim import masked_freeze

        tx = masked_freeze(
            optax.adamw(
                optax.warmup_cosine_decay_schedule(1e-6, 1e-4, 2, 10, 1e-6)
            ),
            action_expert_mask(params),
        )
        opt_state = tx.init(params)
        step = make_optax_train_step(model, tx, donate=True)
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(0)
        )
        jax.block_until_ready(loss)
    assert jnp.isfinite(loss), f"non-finite loss: {loss}"

    # 2) TP+DP-sharded inference on the SAME mesh (the product's core path)
    noise = jax.device_put(
        jnp.asarray(
            rng.randn(bsz, cfg.horizon_steps, cfg.action_dim), jnp.float32
        ),
        bsh,
    )
    with mesh:
        infer = jax.jit(model.infer_action)
        actions = infer(
            params,
            batch["input_ids"],
            batch["attention_mask"],
            batch["pixel_values"],
            batch["proprios"],
            noise,
        )
        jax.block_until_ready(actions)
    infer_ok = bool(jnp.all(jnp.isfinite(actions)))
    assert infer_ok, "non-finite sharded inference output"

    # 3) single-device control run: identical init/batch/keys, no mesh.
    # jax's partitionable threefry makes the in-step noise/flow-time draws
    # identical regardless of sharding, so loss and actions must agree to
    # collective-reduction tolerance.
    params_1d = model.canonicalize_tied_weights(
        model.tie_action_proprio_weights(model.init_params(jax.random.PRNGKey(0)))
    )
    batch_1d = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(am),
        "pixel_values": jnp.asarray(batch["pixel_values"]),
        "proprios": jnp.asarray(batch["proprios"]),
        "actions": jnp.asarray(batch["actions"]),
    }
    tx_1d = masked_freeze(
        optax.adamw(optax.warmup_cosine_decay_schedule(1e-6, 1e-4, 2, 10, 1e-6)),
        action_expert_mask(params_1d),
    )
    opt_state_1d = tx_1d.init(params_1d)
    step_1d = make_optax_train_step(model, tx_1d)
    # keep the post-step weights: the sharded inference above also ran on the
    # post-step params, so both sides must infer from the same point
    params_1d, _, loss_1d = step_1d(
        params_1d, opt_state_1d, batch_1d, jax.random.PRNGKey(0)
    )
    actions_1d = jax.jit(model.infer_action)(
        params_1d,
        batch_1d["input_ids"],
        batch_1d["attention_mask"],
        batch_1d["pixel_values"],
        batch_1d["proprios"],
        jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        float(loss), float(loss_1d), rtol=5e-4, atol=5e-5,
        err_msg=f"sharded loss diverges from single-device at {data}x{model_par}",
    )
    np.testing.assert_allclose(
        np.asarray(actions), np.asarray(actions_1d), rtol=5e-4, atol=5e-5,
        err_msg=f"sharded actions diverge from single-device at {data}x{model_par}",
    )

    # 4) pipeline-parallel flow loss: the same tiny architecture with a
    # 4-layer joint stack split over a ('pipe',) 2-stage mesh (shard_map +
    # ppermute GPipe, parallel/pipeline.py) must equal the plain layer scan.
    from blurr_tpu.parallel.pipeline import (
        PipelineCtx,
        make_pipeline_mesh,
        shard_params_pipeline,
    )

    cfg_pp = tiny_pi0_cfg()
    cfg_pp["joint"]["config"]["num_hidden_layers"] = 4  # divisible by stages
    model_pp = PiZero(cfg_pp)
    params_pp = model_pp.init_params(jax.random.PRNGKey(1))
    t_pp = jnp.asarray(rng.rand(bsz), jnp.float32)
    x0_pp = jnp.asarray(
        rng.randn(bsz, cfg_pp.horizon_steps, cfg_pp.action_dim), jnp.float32
    )
    # host copies: batch_1d leaves carry committed 8-device shardings from
    # the runs above, which would clash with the 2-device pipe mesh
    flow_args = tuple(
        jnp.asarray(np.asarray(x))
        for x in (
            batch_1d["input_ids"], batch_1d["attention_mask"],
            batch_1d["pixel_values"], batch_1d["proprios"],
            batch_1d["actions"], t_pp, x0_pp,
        )
    )
    loss_plain = float(model_pp.flow_loss(params_pp, *flow_args))
    pp_mesh = make_pipeline_mesh(2, devices=devices[:2])
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(pp_mesh, PartitionSpec())
    loss_pp = float(
        model_pp.flow_loss(
            shard_params_pipeline(params_pp, pp_mesh),
            *(jax.device_put(x, rep) for x in flow_args),
            pipeline=PipelineCtx(pp_mesh),
        )
    )
    np.testing.assert_allclose(
        loss_pp, loss_plain, rtol=5e-4, atol=5e-5,
        err_msg="pipeline-parallel flow loss diverges from the plain scan",
    )

    # 5) sequence-parallel flow loss: the same model with its SigLIP/vlm
    # token axes sharded over a ('data'=2,'seq'=2) mesh (GSPMD SP,
    # parallel/mesh.py:sp_constrain) must also equal the plain scan.
    # (data axis degrades to 1 when the contract runs on only 2 devices)
    sp_data = 2 if n_devices >= 4 else 1
    sp_mesh = make_mesh(data=sp_data, seq=2, devices=devices[: 2 * sp_data])
    sp_params = shard_params(params_pp, sp_mesh)
    sp_bsh = batch_sharding(sp_mesh)
    with sp_mesh:
        loss_sp = float(
            jax.jit(
                lambda p, *a: model_pp.flow_loss(p, *a, sp_axis="seq")
            )(sp_params, *(jax.device_put(x, sp_bsh) for x in flow_args))
        )
    np.testing.assert_allclose(
        loss_sp, loss_plain, rtol=5e-4, atol=5e-5,
        err_msg="sequence-parallel flow loss diverges from the plain scan",
    )

    # 6) QLoRA sharded train step (OpenVLA family,
    # scripts/train_openvla_lora.py --quantize-base w8a8 --dp/--tp): int8
    # llama base + LoRA factors over the SAME (data, model) mesh, gradients
    # through the straight-through VJPs; the sharded CE loss must equal the
    # single-device run.
    from blurr_tpu.models.openvla.llama import quantize_llama_w8a8
    from blurr_tpu.models.openvla.model import OpenVLA, OpenVLASpec
    from blurr_tpu.ops.lora import inject_lora_tree, lora_trainable_mask

    spec_q = OpenVLASpec.tiny()
    model_q = OpenVLA(spec_q)
    params_q = model_q.init_params(jax.random.PRNGKey(2))
    llama_q = dict(quantize_llama_w8a8(params_q["llama"]))
    llama_q["layers"] = inject_lora_tree(
        llama_q["layers"], jax.random.PRNGKey(3), 2, ("q_w", "v_w")
    )
    # non-zero B so the factor path contributes to the loss being compared
    llama_q["layers"]["q_w"] = dict(
        llama_q["layers"]["q_w"],
        lora_b=0.02 * jax.random.normal(
            jax.random.PRNGKey(4), llama_q["layers"]["q_w"]["lora_b"].shape
        ),
    )
    params_q = dict(params_q, llama=llama_q)
    n_prompt = 9
    ids_q = np.concatenate(
        [
            np.ones((bsz, 1), np.int32),
            rng.randint(3, 1000, (bsz, n_prompt - 1)).astype(np.int32),
            rng.randint(31744, 32000, (bsz, spec_q.action_dim)).astype(np.int32),
        ],
        axis=1,
    )
    valid_q = np.ones_like(ids_q)
    labels_q = ids_q[:, n_prompt:]
    px_q = rng.randn(
        bsz, 6, spec_q.siglip.image_size, spec_q.siglip.image_size
    ).astype(np.float32)
    tx_q = masked_freeze(optax.adamw(1e-3), lora_trainable_mask(params_q))

    from blurr_tpu.utils.optim import value_and_grad_frozen_int

    def step_q(p, o, ids, valid, px, labels):
        loss, grads = value_and_grad_frozen_int(
            lambda p: model_q.action_ce_loss(p, ids, valid, px, labels)
        )(p)
        updates, o = tx_q.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    batch_q = (jnp.asarray(ids_q), jnp.asarray(valid_q), jnp.asarray(px_q),
               jnp.asarray(labels_q))
    _, _, loss_q1 = jax.jit(step_q)(params_q, tx_q.init(params_q), *batch_q)
    sharded_q = shard_params(params_q, mesh)
    batch_qs = tuple(jax.device_put(x, bsh) for x in batch_q)
    _, _, loss_qs = jax.jit(step_q)(sharded_q, tx_q.init(sharded_q), *batch_qs)
    np.testing.assert_allclose(
        float(loss_qs), float(loss_q1), rtol=5e-4, atol=5e-5,
        err_msg=f"QLoRA sharded CE loss diverges at {data}x{model_par}",
    )

    # 7) w4a8 x tensor parallelism (round-4 verdict Next #3): the Pallas
    # int4 kernel's GSPMD rule (ops/pallas_int4_matmul.py:int4_matmul_spmd)
    # column-shards the repacked block-major weights over 'model'; the
    # greedy-decoded action TOKENS must be bit-identical to single-device
    # (column sharding never splits a dot's K reduction). BLURR_INT4_FORCE=
    # interpret runs the REAL kernel + partitioning rule per shard on the
    # virtual CPU devices instead of the dequantized fallback.
    from blurr_tpu.models.openvla.llama import quantize_llama_w4a8

    params_w4 = model_q.init_params(jax.random.PRNGKey(2))
    params_w4 = dict(params_w4, llama=quantize_llama_w4a8(params_w4["llama"]))
    prompt_q = jnp.asarray(ids_q[:, :n_prompt])
    px_j = jnp.asarray(px_q)
    prev_force = os.environ.get("BLURR_INT4_FORCE")
    os.environ["BLURR_INT4_FORCE"] = "interpret"
    try:
        toks_1d = jax.jit(model_q.predict_action_tokens)(
            params_w4, prompt_q, px_j
        )
        sharded_w4 = shard_params(params_w4, mesh)  # repacks NB per 'model'
        with mesh:
            toks_tp = jax.jit(model_q.predict_action_tokens)(
                sharded_w4, jax.device_put(prompt_q, bsh),
                jax.device_put(px_j, bsh),
            )
            jax.block_until_ready(toks_tp)
    finally:
        if prev_force is None:
            os.environ.pop("BLURR_INT4_FORCE", None)
        else:
            os.environ["BLURR_INT4_FORCE"] = prev_force
    np.testing.assert_array_equal(
        np.asarray(toks_tp), np.asarray(toks_1d),
        err_msg=f"w4a8 TP action tokens diverge at {data}x{model_par}",
    )

    # 8) ring attention (ops/ring_attention.py): K/V blocks rotating over
    # the 'seq' axis via ppermute — output AND input gradients must equal
    # the plain grouped_attention reference.
    from blurr_tpu.ops.attention import grouped_attention
    from blurr_tpu.ops.ring_attention import ring_attention

    rb, rnh, rkvh, rs, rd = 2, 4, 2, 8, 16
    qkv = [
        jnp.asarray(rng.randn(rb, h, rs, rd), jnp.float32)
        for h in (rnh, rkvh, rkvh)
    ]
    causal_mask = jnp.tril(jnp.ones((rs, rs), bool))[None]

    def ref_attn(q, k, v):
        return grouped_attention(q, k, v, jnp.broadcast_to(
            causal_mask, (rb, rs, rs)))

    ring_mesh = make_mesh(data=1, seq=2, devices=devices[:2])

    def ring_attn(q, k, v):
        return ring_attention(q, k, v, ring_mesh, causal=True)

    out_ref, grads_ref = jax.value_and_grad(
        lambda *a: jnp.sum(jnp.sin(ref_attn(*a))), argnums=(0, 1, 2)
    )(*qkv)
    out_ring, grads_ring = jax.value_and_grad(
        lambda *a: jnp.sum(jnp.sin(ring_attn(*a))), argnums=(0, 1, 2)
    )(*qkv)
    np.testing.assert_allclose(
        float(out_ring), float(out_ref), rtol=5e-5, atol=5e-5,
        err_msg="ring attention output diverges from grouped_attention",
    )
    for g_r, g_p in zip(grads_ring, grads_ref):
        np.testing.assert_allclose(
            np.asarray(g_r), np.asarray(g_p), rtol=5e-4, atol=5e-5,
            err_msg="ring attention gradients diverge from grouped_attention",
        )

    # 9) dp/tp serving bucket: the Pi-0 action server's jitted control step
    # (agent/eval_agent.py:make_noise_infer — in-graph fold_in noise, the
    # ONE shared derivation) over the same (data, model) mesh must produce
    # the single-device bucket's actions. This is serving/server.py's
    # steady-state program, asserted at the driver-contract level.
    from blurr_tpu.agent.eval_agent import make_noise_infer

    step_srv = make_noise_infer(
        model.infer_action, cfg.horizon_steps, cfg.action_dim, jnp.float32
    )
    srv_key, srv_idx = jax.random.PRNGKey(7), 3
    with mesh:
        acts_srv = step_srv(
            params, batch["input_ids"], batch["attention_mask"],
            batch["pixel_values"], batch["proprios"], srv_key, srv_idx,
        )
        jax.block_until_ready(acts_srv)
    acts_srv_1d = step_srv(
        params_1d, batch_1d["input_ids"], batch_1d["attention_mask"],
        batch_1d["pixel_values"], batch_1d["proprios"], srv_key, srv_idx,
    )
    np.testing.assert_allclose(
        np.asarray(acts_srv), np.asarray(acts_srv_1d), rtol=5e-4, atol=5e-5,
        err_msg=f"dp/tp serving bucket diverges at {data}x{model_par}",
    )

    return {
        "loss": float(loss),
        "infer_ok": infer_ok,
        "matches_single_device": True,
        "pipeline_parallel_ok": True,
        "sequence_parallel_ok": True,
        "qlora_openvla_ok": True,
        "w4a8_tp_ok": True,
        "ring_attention_ok": True,
        "serving_bucket_ok": True,
    }
