"""Joint mixture transformer engine, TPU-native.

The reference engine (reference src/model/vla/joint_model.py) runs N
"mixtures" (vlm / proprio / action expert) that share one attention pattern
per layer while keeping separate weights, with a mutable per-mixture KVCache
and three string cache modes. This re-design keeps the exact math but maps it
to XLA's compilation model:

- Layer weights are stacked on a leading [L, ...] axis and every multi-layer
  walk is a single ``jax.lax.scan`` — one compiled loop body instead of 18
  unrolled layers.
- The KV cache is a functional pytree ``(k, v)`` of shape
  [L, B, KV_heads, S_prefix, head_dim], produced once by ``prefill`` and
  threaded (and donated) through the flow-integration scan. The reference's
  cache modes map to dedicated entry points:
    * ``append_non_active``  -> ``prefill`` + ``decode``   (fast action path)
    * ``no_append``          -> ``naive_forward``           (ablation path)
    * ``append``             -> ``single_forward`` (driven by
      ``pizero.infer_text_prefill`` / ``infer_text_decode_step``)
                                (autoregressive text path, preallocated buffer)
- The last prefill layer computes only K/V: its attention output is discarded
  by the reference anyway (final_layer_post_attn_skip_names, joint_model.py
  :344,380-383), so we skip the whole attention+MLP there.

Numerics: embeds scaled by sqrt(hidden) at entry (bf16-rounded like the
reference, joint_model.py:356-365); Gemma RMSNorm / fp32 RoPE / tanh
soft-clamp 50.0 in the non-flash path (joint_model.py:272-288).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from blurr_tpu.ops.activations import geglu
from blurr_tpu.ops.attention import DEFAULT_SOFTCLAMP, grouped_attention
from blurr_tpu.ops.norms import (
    adaptive_layerscale,
    adaptive_rms_norm,
    rms_norm,
)
from blurr_tpu.ops.attention import merge_heads as _merge_heads
from blurr_tpu.ops.attention import split_heads as _split_heads
from blurr_tpu.ops.quant import dequantize_kv, mm
from blurr_tpu.ops.rotary import apply_rope, rope_cos_sin


# ---------------------------------------------------------------------------
# Static specs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MixtureSpec:
    hidden_size: int
    intermediate_size: int
    rope_theta: float = 10000.0
    use_final_norm: bool = False
    cache: bool = True
    adaptive_mode: Optional[str] = None  # None | "adaLN" | "adaLN-Zero"
    # per-mixture clamp before quantized matmuls (action_quantization's clip
    # must not leak into a quantized VLM mixture and vice versa)
    activation_clip: Optional[float] = None


@dataclass(frozen=True)
class JointSpec:
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    time_hidden_size: int = 256
    use_softclamp: bool = True  # reference use_flash_attn=False semantics
    attn_impl: str = "xla"  # "xla" | "pallas" (fused flash kernel on TPU)
    activation_clip: Optional[float] = None  # clamp before quantized matmuls
    mixtures: Dict[str, MixtureSpec] = field(default_factory=dict)

    @property
    def softclamp(self) -> Optional[float]:
        return DEFAULT_SOFTCLAMP if self.use_softclamp else None

    @staticmethod
    def from_config(cfg: dict) -> "JointSpec":
        mixtures = {}
        for name, m in cfg["mixture"].items():
            clip = m.get("activation_clip")
            mixtures[name] = MixtureSpec(
                hidden_size=m["hidden_size"],
                intermediate_size=m["intermediate_size"],
                rope_theta=float(m.get("rope_theta", 10000.0)),
                use_final_norm=bool(m.get("use_final_norm", False)),
                cache=bool(m.get("cache", True)),
                adaptive_mode=m.get("adaptive_mode") or None,
                activation_clip=float(clip) if clip is not None else None,
            )
        return JointSpec(
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg["num_key_value_heads"],
            head_dim=cfg["head_dim"],
            rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
            time_hidden_size=int(cfg.get("time_hidden_size", 256) or 256),
            # The reference's use_flash_attn toggles SDPA (and silently skips
            # the soft-clamp there); our fused Pallas kernel supports the
            # clamp, so enabling it never changes semantics.
            attn_impl="pallas" if cfg.get("use_flash_attn", False) else "xla",
            mixtures=mixtures,
        )


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _norm_params(nl: Optional[int], h: int, spec: MixtureSpec, tc: int, key, dtype):
    """Norm parameter block: Gemma RMSNorm scale or adaptive (adaLN) params.
    ``nl=None`` gives unstacked (final-norm) params."""
    shape = (h,) if nl is None else (nl, h)
    if spec.adaptive_mode:
        cond_shape = (tc, h) if nl is None else (nl, tc, h)
        k1, k2 = jax.random.split(key)
        return {
            "to_gamma_w": jax.random.normal(k1, cond_shape, dtype) * (tc**-0.5),
            "to_gamma_b": jnp.zeros(shape, dtype),
            "to_beta_w": jax.random.normal(k2, cond_shape, dtype) * (tc**-0.5),
        }
    return {"scale": jnp.zeros(shape, dtype)}  # Gemma stores w, applies (1+w)


def init_mixture_params(
    rng: jax.Array, spec: MixtureSpec, joint: JointSpec, dtype=jnp.float32
) -> Dict:
    nl = joint.num_hidden_layers
    h = spec.hidden_size
    inter = spec.intermediate_size
    nh, kvh, hd = joint.num_attention_heads, joint.num_key_value_heads, joint.head_dim
    tc = joint.time_hidden_size
    keys = iter(jax.random.split(rng, 16))

    def stack(key, fan_in, shape):
        return jax.random.normal(key, (nl, *shape), dtype) * (fan_in**-0.5)

    params = {
        "q_w": stack(next(keys), h, (h, nh * hd)),
        "k_w": stack(next(keys), h, (h, kvh * hd)),
        "v_w": stack(next(keys), h, (h, kvh * hd)),
        "o_w": stack(next(keys), nh * hd, (nh * hd, h)),
        "gate_w": stack(next(keys), h, (h, inter)),
        "up_w": stack(next(keys), h, (h, inter)),
        "down_w": stack(next(keys), inter, (inter, h)),
        "input_norm": _norm_params(nl, h, spec, tc, next(keys), dtype),
        "post_norm": _norm_params(nl, h, spec, tc, next(keys), dtype),
    }
    if spec.adaptive_mode == "adaLN-Zero":
        for name in ("post_scale", "final_scale"):
            params[name] = {
                "gamma_w": jnp.zeros((nl, tc, h), dtype),
                "gamma_b": jnp.full((nl, h), -2.0, dtype),  # adaln_zero_bias_init
            }
    if spec.use_final_norm:
        params["final_norm"] = _norm_params(None, h, spec, tc, next(keys), dtype)
    return params


def init_joint_params(
    rng: jax.Array, spec: JointSpec, dtype=jnp.float32
) -> Dict[str, Dict]:
    keys = jax.random.split(rng, len(spec.mixtures))
    return {
        name: init_mixture_params(k, m, spec, dtype)
        for k, (name, m) in zip(keys, spec.mixtures.items())
    }


# ---------------------------------------------------------------------------
# Per-mixture layer pieces
# ---------------------------------------------------------------------------


def _apply_norm(np_: Dict, x, time_cond, spec: MixtureSpec, eps: float):
    if spec.adaptive_mode:
        return adaptive_rms_norm(x, time_cond, np_, eps)
    return rms_norm(x, np_["scale"], eps)


def _apply_scale(lp: Dict, name: str, x, time_cond, spec: MixtureSpec):
    """adaLN-Zero gated branch scale; identity otherwise."""
    if spec.adaptive_mode == "adaLN-Zero":
        return adaptive_layerscale(x, time_cond, lp[name])
    return x


def _attention(spec: JointSpec, q, k, v, mask):
    """Attention impl dispatch: fused Pallas flash kernel on TPU when
    configured (and the query block is large enough to amortize), XLA
    otherwise. Both apply the same soft-clamp semantics."""
    if (
        spec.attn_impl == "pallas"
        and q.shape[2] >= 64
        and jax.default_backend() == "tpu"
    ):
        from blurr_tpu.ops.pallas_attention import flash_attention

        return flash_attention(q, k, v, mask, softclamp=spec.softclamp)
    return grouped_attention(q, k, v, mask, spec.softclamp)


def _clip_for(joint: JointSpec, m: "MixtureSpec" = None) -> Optional[float]:
    """Per-mixture activation clip, falling back to the joint-global one."""
    if m is not None and m.activation_clip is not None:
        return m.activation_clip
    return joint.activation_clip


def _qkv(lp, x, cos, sin, joint: JointSpec, m: "MixtureSpec" = None):
    """Project + rope one mixture's normed hidden states.

    Returns q [B,NH,S,D] (roped), k [B,KVH,S,D] (roped), v [B,KVH,S,D].
    Weight leaves may be int8-quantized dicts (ops.quant.mm dispatches)."""
    nh, kvh, hd = joint.num_attention_heads, joint.num_key_value_heads, joint.head_dim
    clip = _clip_for(joint, m)
    q = apply_rope(_split_heads(mm(x, lp["q_w"], clip), nh, hd), cos, sin)
    k = apply_rope(_split_heads(mm(x, lp["k_w"], clip), kvh, hd), cos, sin)
    v = _split_heads(mm(x, lp["v_w"], clip), kvh, hd)
    return q, k, v


def _mlp(lp, x, joint: JointSpec = None, m: "MixtureSpec" = None,
         return_inner: bool = False):
    clip = _clip_for(joint, m) if joint is not None else None
    inner = geglu(mm(x, lp["gate_w"], clip), mm(x, lp["up_w"], clip))
    out = mm(inner, lp["down_w"], clip)
    return (out, inner) if return_inner else out


def scale_embeds(x: jax.Array) -> jax.Array:
    """sqrt(hidden) entry scaling, rounded in the compute dtype like the
    reference (joint_model.py:356-365 builds the scalar in embeds.dtype)."""
    scale = jnp.asarray(x.shape[-1] ** 0.5, dtype=x.dtype)
    return x * scale


def mixture_rope(
    spec: MixtureSpec, joint: JointSpec, position_ids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    return rope_cos_sin(position_ids, joint.head_dim, spec.rope_theta)


# ---------------------------------------------------------------------------
# Prefill: vlm + proprio forward, emit prefix KV cache
# ---------------------------------------------------------------------------


def prefill(
    params: Dict[str, Dict],
    spec: JointSpec,
    embeds: Dict[str, jax.Array],  # {"vlm": [B,Sv,Hv], "proprio": [B,Sp,Hp]}
    position_ids: Dict[str, jax.Array],
    prefix_mask: jax.Array,  # bool [B, Sv+Sp, Sv+Sp]
    time_cond: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run the instruction prefix (image+text+proprio) once per control step.

    Returns the prefix KV cache ``(k, v)`` with shape
    [L, B, KV_heads, Sv+Sp, head_dim]; K is stored post-RoPE, matching the
    reference cache contents (joint_model.py:198-222).

    ``time_cond`` feeds adaptive (adaLN) mixtures; caching an adaptive
    mixture's K/V is only valid for a fixed conditioning, so the caller
    passes the t=0 flow-time embedding (the reference's cached path would
    crash here — adaptive mode only ran through its naive/training paths).
    """
    names = list(embeds.keys())
    eps = spec.rms_norm_eps
    svs = [embeds[n].shape[1] for n in names]
    nl = spec.num_hidden_layers

    hs = {n: scale_embeds(embeds[n]) for n in names}
    ropes = {n: mixture_rope(spec.mixtures[n], spec, position_ids[n]) for n in names}

    def tc_for(n):
        return time_cond if spec.mixtures[n].adaptive_mode else None

    def full_layer(carry, xs):
        layer_idx, lps = xs
        hs = dict(zip(names, carry))
        qs, ks, vs = [], [], []
        for n in names:
            m = spec.mixtures[n]
            x = _apply_norm(lps[n]["input_norm"], hs[n], tc_for(n), m, eps)
            q, k, v = _qkv(lps[n], x, *ropes[n], spec, m)
            qs.append(q)
            ks.append(k)
            vs.append(v)
        q = jnp.concatenate(qs, axis=2)
        k = jnp.concatenate(ks, axis=2)
        v = jnp.concatenate(vs, axis=2)

        def attn_mlp(carry):
            attn = _attention(spec, q, k, v, prefix_mask)
            attn = _merge_heads(attn)
            outs = []
            offset = 0
            for n, s in zip(names, svs):
                m = spec.mixtures[n]
                a = mm(attn[:, offset : offset + s], lps[n]["o_w"], _clip_for(spec, m))
                a = _apply_scale(lps[n], "post_scale", a, tc_for(n), m)
                offset += s
                h = hs[n] + a
                x = _apply_norm(lps[n]["post_norm"], h, tc_for(n), m, eps)
                mlp_out = _mlp(lps[n], x, spec, m)
                mlp_out = _apply_scale(lps[n], "final_scale", mlp_out, tc_for(n), m)
                h = h + mlp_out
                outs.append(h)
            return tuple(outs)

        # the LAST layer's attention+MLP output is discarded by every caller
        # (reference final_layer_post_attn_skip_names, joint_model.py
        # :344,380-383) — only its K/V matter. A cond skips that compute
        # without slicing the stacked weight tree (which would materialize a
        # near-full parameter copy inside the jit, measured ~11 ms on v5e);
        # measured −0.15 ms on the production S=277 prefill
        # (docs/results/stage_budget_v5e.md).
        new_carry = jax.lax.cond(
            layer_idx < nl - 1, attn_mlp, lambda c: c, carry
        )
        return new_carry, (k, v)

    stacked = {
        n: {k: v for k, v in params[n].items() if k != "final_norm"} for n in names
    }
    carry = tuple(hs[n] for n in names)
    _, (k_all, v_all) = jax.lax.scan(
        full_layer, carry, (jnp.arange(nl), stacked)
    )
    return k_all, v_all


# ---------------------------------------------------------------------------
# Decode: action expert over the cached prefix (append_non_active)
# ---------------------------------------------------------------------------


def decode(
    params: Dict[str, Dict],
    spec: JointSpec,
    action_embeds: jax.Array,  # [B, A, Ha]
    action_position_ids: jax.Array,
    cache: Tuple[jax.Array, jax.Array],  # ([L,B,KVH,P,D], [L,B,KVH,P,D])
    action_mask: jax.Array,  # bool [B, A, P+A]
    time_cond: Optional[jax.Array] = None,
    kv_dequant_dtype=None,  # cfg kv_quantization.dtype (reference
    # kv_cache.py:100-106 dequantizes to a configured fp dtype)
) -> jax.Array:
    """One flow-integration step of the action expert.

    Queries come from the 4 action tokens only; K/V is the cached prefix
    concatenated with fresh action K/V (cache_mode="append_non_active",
    joint_model.py:164-243). Returns final-normed action hidden states.
    """
    ap = params["action"]
    m = spec.mixtures["action"]
    eps = spec.rms_norm_eps
    cos, sin = mixture_rope(m, spec, action_position_ids)
    if isinstance(cache, dict):  # possibly int8-quantized (k, v, *_scale)
        k_cache, v_cache = cache["k"], cache["v"]
        k_scale, v_scale = cache.get("k_scale"), cache.get("v_scale")
    else:
        k_cache, v_cache = cache
        k_scale = v_scale = None
    quantized = k_scale is not None

    layer_stack = {k: ap[k] for k in ap if k != "final_norm"}
    dtype = kv_dequant_dtype or action_embeds.dtype

    def layer(h, xs):
        if quantized:
            lp, kc, vc, ks, vs = xs
            kc = dequantize_kv(kc, ks, dtype)
            vc = dequantize_kv(vc, vs, dtype)
        else:
            lp, kc, vc = xs
        x = _apply_norm(lp["input_norm"], h, time_cond, m, eps)
        q, k, v = _qkv(lp, x, cos, sin, spec, m)
        k_full = jnp.concatenate([kc, k], axis=2)
        v_full = jnp.concatenate([vc, v], axis=2)
        attn = _attention(spec, q, k_full, v_full, action_mask)
        a = mm(_merge_heads(attn), lp["o_w"], _clip_for(spec, m))
        a = _apply_scale(lp, "post_scale", a, time_cond, m)
        h = h + a
        x = _apply_norm(lp["post_norm"], h, time_cond, m, eps)
        mlp_out = _mlp(lp, x, spec, m)
        mlp_out = _apply_scale(lp, "final_scale", mlp_out, time_cond, m)
        return h + mlp_out, None

    h = scale_embeds(action_embeds)
    xs = (
        (layer_stack, k_cache, v_cache, k_scale, v_scale)
        if quantized
        else (layer_stack, k_cache, v_cache)
    )
    h, _ = jax.lax.scan(layer, h, xs)
    return _apply_norm(ap["final_norm"], h, time_cond, m, eps)


# ---------------------------------------------------------------------------
# Naive path: all mixtures forwarded every step (no_append)
# ---------------------------------------------------------------------------


def naive_forward(
    params: Dict[str, Dict],
    spec: JointSpec,
    embeds: Dict[str, jax.Array],  # vlm, proprio, action
    position_ids: Dict[str, jax.Array],
    full_mask: jax.Array,  # bool [B, T, T]
    time_cond: Optional[jax.Array] = None,
    return_all: bool = False,
    prefix_time_cond: Optional[jax.Array] = None,
    remat: bool = False,
    pipeline=None,  # parallel.pipeline.PipelineCtx: stage the layer scan
    sp_axis: Optional[str] = None,  # mesh axis to sequence-shard vlm tokens
    capture: bool = False,  # also return per-layer linear INPUTS (GPTQ
    # calibration, models/pi0/calibrate.py); incompatible with pipeline
) -> jax.Array:
    """Forward all mixtures jointly with the full block mask (the reference's
    infer_action_naive / flow-matching-training path). Returns the action
    mixture's final-normed hidden states ([B, A, Ha]), or all mixtures' last
    hidden states when ``return_all`` (training/diagnostics).

    ``sp_axis`` enables GSPMD sequence parallelism for training: the vlm
    mixture's hidden states (the long axis — 277 of the 282 tokens) carry a
    P(None, sp_axis, None) constraint at entry and after every layer, so
    norms and MLPs compute on 1/n of the tokens per device and attention
    all-gathers only the tiny MQA K/V (1 head x head_dim) over ICI. The
    proprio/action mixtures (5 tokens) stay replicated. New design — the
    reference has no sequence scaling (SURVEY.md §5).

    ``remat`` wraps the scanned layer body in ``jax.checkpoint``: the
    backward pass recomputes each layer's activations instead of storing
    all L layers' worth — the standard TPU HBM-for-FLOPs trade that buys
    larger training batches (inference never differentiates through this,
    so the flag only matters under ``jax.grad``).

    ``prefix_time_cond`` conditions the NON-action adaptive mixtures when
    given: the reference's no_append flow loop caches vlm/proprio K/V on the
    first denoising step and freezes them for the rest (joint_model.py
    :180-197), so an adaptive proprio mixture stays conditioned on the t=0
    time embedding while the action branch advances — callers replicating
    that loop pass the t=0 embedding here (training passes nothing: one
    shared conditioning, no caching).
    """
    names = list(embeds.keys())
    eps = spec.rms_norm_eps
    svs = [embeds[n].shape[1] for n in names]
    total = sum(svs)
    offsets = [sum(svs[:i]) for i in range(len(svs))]

    hs = {n: scale_embeds(embeds[n]) for n in names}
    ropes = {n: mixture_rope(spec.mixtures[n], spec, position_ids[n]) for n in names}
    if sp_axis is not None:
        if pipeline is not None:
            raise ValueError(
                "sequence parallelism (sp_axis) and pipeline parallelism use "
                "different meshes; compose sp with data/tensor axes instead"
            )
        from blurr_tpu.parallel.mesh import sp_constrain

        hs["vlm"] = sp_constrain(hs["vlm"], sp_axis)

    def _tc_for(n, tc, ptc):
        if not spec.mixtures[n].adaptive_mode:
            return None
        if n != "action" and ptc is not None:
            return ptc
        return tc

    def tc_for(n):  # the un-pipelined closure form (also the final norms)
        return _tc_for(n, time_cond, prefix_time_cond)

    def layer_core(hs, lps, ropes, mask, tc, ptc, capture=False):
        def tc_for(n):
            return _tc_for(n, tc, ptc)

        cap = {n: {} for n in names} if capture else None
        qs, ks, vs = [], [], []
        for n in names:
            m = spec.mixtures[n]
            x = _apply_norm(lps[n]["input_norm"], hs[n], tc_for(n), m, eps)
            if capture:
                cap[n]["attn_in"] = x  # q_w/k_w/v_w share this input
            q, k, v = _qkv(lps[n], x, *ropes[n], spec, m)
            qs.append(q)
            ks.append(k)
            vs.append(v)
        attn = _attention(
            spec,
            jnp.concatenate(qs, axis=2),
            jnp.concatenate(ks, axis=2),
            jnp.concatenate(vs, axis=2),
            mask,
        )
        attn = _merge_heads(attn)
        outs = {}
        for n, s, off in zip(names, svs, offsets):
            m = spec.mixtures[n]
            o_in = attn[:, off : off + s]
            a = mm(o_in, lps[n]["o_w"], _clip_for(spec, m))
            a = _apply_scale(lps[n], "post_scale", a, tc_for(n), m)
            h = hs[n] + a
            x = _apply_norm(lps[n]["post_norm"], h, tc_for(n), m, eps)
            if capture:
                cap[n]["o_in"] = o_in
                cap[n]["mlp_in"] = x  # gate_w/up_w share this input
                mlp_out, cap[n]["down_in"] = _mlp(
                    lps[n], x, spec, m, return_inner=True
                )
            else:
                mlp_out = _mlp(lps[n], x, spec, m)
            mlp_out = _apply_scale(lps[n], "final_scale", mlp_out, tc_for(n), m)
            outs[n] = h + mlp_out
        return (outs, cap) if capture else outs

    def full_layer(carry, lps):
        res = layer_core(
            dict(zip(names, carry)), lps, ropes, full_mask,
            time_cond, prefix_time_cond, capture=capture,
        )
        outs, cap = res if capture else (res, None)
        if sp_axis is not None:
            # re-pin after every layer so the scan carry stays token-sharded
            # (without this GSPMD may all-gather once and keep it replicated)
            from blurr_tpu.parallel.mesh import sp_constrain

            outs["vlm"] = sp_constrain(outs["vlm"], sp_axis)
        return tuple(outs[n] for n in names), cap

    # Uniform scan over ALL layers (no stacked-tree slicing — see prefill).
    # The last layer's vlm/proprio outputs are computed and discarded; the
    # action output is unaffected (it depends only on the final K/V and the
    # action branch), matching the reference's skip semantics.
    stacked = {
        n: {k: v for k, v in params[n].items() if k != "final_norm"} for n in names
    }
    carry = tuple(hs[n] for n in names)
    if capture and pipeline is not None:
        raise ValueError("capture (GPTQ calibration) and pipeline "
                         "parallelism do not compose; calibrate single-chip")
    caps = None
    if pipeline is not None:
        # Pipeline-parallel layer scan (parallel/pipeline.py): the hidden
        # states rotate stage-to-stage; the batch-dependent layer INVARIANTS
        # (rope tables, mask, time conditioning) go in as consts, which each
        # stage reads from the replicated microbatch buffer instead of
        # paying ppermute/psum traffic for them every tick.
        from blurr_tpu.parallel.pipeline import pipelined_scan

        def pp_layer(packet, lps):
            hs_t, (ropes_p, mask_p, tc_p, ptc_p) = packet
            outs = layer_core(
                dict(zip(names, hs_t)), lps, ropes_p, mask_p, tc_p, ptc_p
            )
            return (tuple(outs[n] for n in names), packet[1]), None

        layer_fn = jax.checkpoint(pp_layer) if remat else pp_layer
        carry = pipelined_scan(
            layer_fn, carry, stacked, pipeline,
            consts=(ropes, full_mask, time_cond, prefix_time_cond),
        )
    else:
        layer_fn = jax.checkpoint(full_layer) if remat else full_layer
        carry, caps = jax.lax.scan(layer_fn, carry, stacked)
    hs = dict(zip(names, carry))
    m_a = spec.mixtures["action"]
    out = _apply_norm(
        params["action"]["final_norm"], hs["action"], tc_for("action"), m_a, eps
    )
    if return_all:
        all_out = {}
        for n in names:
            if n == "action":
                all_out[n] = out
            elif spec.mixtures[n].use_final_norm:
                all_out[n] = _apply_norm(
                    params[n]["final_norm"], hs[n], tc_for(n),
                    spec.mixtures[n], eps,
                )
            else:
                all_out[n] = hs[n]
        return (all_out, caps) if capture else all_out
    # caps: {mixture: {"attn_in"/"o_in"/"mlp_in"/"down_in": [L, B, S, K]}}
    # — the per-layer inputs of every quantizable linear (scan-stacked)
    return (out, caps) if capture else out


# ---------------------------------------------------------------------------
# Single-mixture autoregressive path (text generation, cache_mode="append")
# ---------------------------------------------------------------------------


def single_forward(
    params: Dict,
    spec: JointSpec,
    name: str,
    embeds: jax.Array,  # [B, S, H]
    position_ids: jax.Array,
    mask: jax.Array,  # bool [B, S, Skv]
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,  # preallocated buffers
    cache_len: Optional[jax.Array] = None,  # tokens already in the cache
    apply_final_norm: bool = True,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """One forward of a single mixture with append-mode caching.

    ``cache`` is a preallocated [L, B, KVH, max_len, D] pair; new K/V for the
    S query tokens is written at offset ``cache_len`` via dynamic_update_slice
    (TPU-friendly fixed-shape decode). Returns (hidden, updated_cache).
    """
    mp = params[name]
    m = spec.mixtures[name]
    eps = spec.rms_norm_eps
    cos, sin = mixture_rope(m, spec, position_ids)
    layer_stack = {k: mp[k] for k in mp if k != "final_norm"}

    use_cache = cache is not None
    if use_cache:
        k_buf, v_buf = cache
        offset = cache_len if cache_len is not None else jnp.int32(0)

    def layer(h, xs):
        if use_cache:
            lp, kc, vc = xs
        else:
            lp = xs
        x = _apply_norm(lp["input_norm"], h, None, m, eps)
        q, k, v = _qkv(lp, x, cos, sin, spec, m)
        if use_cache:
            kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, offset, 0))
            vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, offset, 0))
            attn = _attention(spec, q, kc, vc, mask)
        else:
            attn = _attention(spec, q, k, v, mask)
        h = h + mm(_merge_heads(attn), lp["o_w"], _clip_for(spec, m))
        x = _apply_norm(lp["post_norm"], h, None, m, eps)
        h = h + _mlp(lp, x, spec, m)
        if use_cache:
            return h, (kc, vc)
        return h, None

    h = scale_embeds(embeds)
    if use_cache:
        h, (k_new, v_new) = jax.lax.scan(layer, h, (layer_stack, k_buf, v_buf))
        new_cache = (k_new, v_new)
    else:
        h, _ = jax.lax.scan(layer, h, layer_stack)
        new_cache = None
    if apply_final_norm and "final_norm" in mp:
        h = _apply_norm(mp["final_norm"], h, None, m, eps)
    return h, new_cache


def alloc_single_cache(
    spec: JointSpec, batch: int, max_len: int, dtype
) -> Tuple[jax.Array, jax.Array]:
    shape = (
        spec.num_hidden_layers,
        batch,
        spec.num_key_value_heads,
        max_len,
        spec.head_dim,
    )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


from blurr_tpu.config.core import register


@register("JointModel")
class JointModel:
    """Thin OO wrapper for config-registry parity (bridge.yaml's
    joint._target_). The engine itself is the functional API above; this
    class binds a JointSpec and exposes the reference's method names."""

    def __init__(self, config):
        self.config = dict(config)
        self.spec = JointSpec.from_config(self.config)
        self.num_hidden_layers = self.spec.num_hidden_layers
        self.mixture_names = list(self.spec.mixtures.keys())
        self.cache_names = [
            n for n, m in self.spec.mixtures.items() if m.cache
        ]

    def init(self, rng, dtype=jnp.float32):
        return init_joint_params(rng, self.spec, dtype)

    def build_mixture_caches(self):
        """The functional engine returns caches from prefill; kept for
        surface parity (reference joint_model.py:333-336)."""
        return {name: None for name in self.cache_names}

    def prefill(self, params, embeds, position_ids, prefix_mask,
                time_cond=None):
        return prefill(params, self.spec, embeds, position_ids, prefix_mask,
                       time_cond)

    def decode(self, params, action_embeds, action_position_ids, cache,
               action_mask, time_cond=None):
        return decode(params, self.spec, action_embeds, action_position_ids,
                      cache, action_mask, time_cond)

    def naive_forward(self, params, embeds, position_ids, full_mask,
                      time_cond=None):
        return naive_forward(params, self.spec, embeds, position_ids,
                             full_mask, time_cond)
