"""INT8 quantization: weight-only linear quant + KV-cache quant.

Capability parity with the reference (src/model/quantization/int8_linear.py,
src/model/kv_cache.py:90-106), TPU-native:

- Weights: per-out-channel symmetric INT8, stored as {"q": int8 [..., in, out],
  "s": scale [..., out]} and dequantized on the fly inside the matmul — XLA
  fuses the dequant multiply into the matmul operand read, so the win is the
  halved HBM traffic for weight reads (the decode path is memory-bound).
  ``cache_fp_weight`` instead stores a dequantized bf16 copy (the reference's
  fast-matmul mode: quantization noise without the bandwidth saving).
- KV cache: per-(L, B, head) symmetric INT8 over the (seq, head_dim) chunk
  with an fp scale, dequantized on read in the decode scan.

Optional ``activation_clip`` clamps activations before quantized matmuls,
matching Int8QuantConfig.activation_clip.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# leaves whose fp32 upcast would exceed this are quantized one leading-axis
# slice at a time: the full-stack transient for e.g. the VLM gate_w
# [18, 2048, 16384] is 2.4 GB of fp32 next to the resident bf16 tree —
# CLAUDE.md's "fp32 transients OOM the 16GB chip" hazard (the 7B Llama
# needed quantize_llama_streaming for exactly this)
_QUANT_CHUNK_BYTES = 512 * 1024**2


def quantize_weight_int8(w: jax.Array, cache_fp_dtype=None) -> dict:
    """[..., in, out] -> {"q": int8, "s": [..., out]} (per-out-channel)."""
    if w.ndim >= 3 and w.size * 4 > _QUANT_CHUNK_BYTES:
        parts = [
            quantize_weight_int8(w[i], cache_fp_dtype=cache_fp_dtype)
            for i in range(w.shape[0])
        ]
        return {k: jnp.stack([p[k] for p in parts]) for k in parts[0]}
    wf = w.astype(jnp.float32)
    scale = jnp.clip(jnp.max(jnp.abs(wf), axis=-2), 1e-6) / 127.0  # [..., out]
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -128, 127).astype(jnp.int8)
    out = {"q": q, "s": scale.astype(jnp.float32)}
    if cache_fp_dtype is not None:
        out = {"fp": (q.astype(jnp.float32) * scale[..., None, :]).astype(cache_fp_dtype)}
    return out


def mm(x: jax.Array, w, activation_clip: Optional[float] = None) -> jax.Array:
    """Matmul dispatching on the weight representation: plain array, int8
    weight-only {"q","s"}, w8a8 {"q8a","s"}, w4a8 {"q4","s"} (block-major
    packed int4, Pallas kernel), cached-fp {"fp"}, or a LoRA adapter dict
    {"w","lora_a","lora_b","lora_s"} (ops/lora.py:inject_lora_tree) whose
    base "w" may itself be any of the former — QLoRA-style quantized-base
    fine-tuning comes from the recursion."""
    if isinstance(w, dict):
        if "lora_a" in w:
            y = mm(x, w["w"], activation_clip)
            d = (x @ w["lora_a"].astype(x.dtype)) @ w["lora_b"].astype(x.dtype)
            return y + d * w["lora_s"].astype(d.dtype)
        if "q8a" in w:
            return w8a8_mm(x, w, activation_clip)
        if "q4" in w:
            return w4a8_mm(x, w, activation_clip)
        if activation_clip is not None:
            x = jnp.clip(x, -activation_clip, activation_clip)
        if "fp" in w:
            return x @ w["fp"].astype(x.dtype)
        deq = w["q"].astype(x.dtype) * w["s"].astype(x.dtype)[..., None, :]
        return x @ deq
    return x @ w


_QUANT_WEIGHT_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def quantize_mixture_int8(mixture_params: dict, cache_fp_weight: bool = False,
                          fp_dtype=jnp.bfloat16) -> dict:
    """Quantize all linear weights of one mixture (norms stay fp)."""
    out = dict(mixture_params)
    fp = fp_dtype if cache_fp_weight else None
    for k in _QUANT_WEIGHT_KEYS:
        if k in out and not isinstance(out[k], dict):
            out[k] = quantize_weight_int8(out[k], cache_fp_dtype=fp)
    return out


def quantize_dense_int8(p: dict, keys: Tuple[str, ...],
                        cache_fp_weight: bool = False, fp_dtype=jnp.bfloat16) -> dict:
    out = dict(p)
    fp = fp_dtype if cache_fp_weight else None
    for k in keys:
        if k in out and not isinstance(out[k], dict):
            out[k] = quantize_weight_int8(out[k], cache_fp_dtype=fp)
    return out


# ---------------------------------------------------------------------------
# KV cache quantization
# ---------------------------------------------------------------------------


def quantize_kv_int8(
    kv: jax.Array, clip: Optional[float] = None
) -> Tuple[jax.Array, jax.Array]:
    """[L, B, H, S, D] -> (int8 values, fp32 scale [L, B, H, 1, 1]); scale is
    the per-(batch, head) absmax over (S, D) like the reference
    _quantize_chunk (kv_cache.py:90-98)."""
    x = kv.astype(jnp.float32)
    if clip is not None:
        x = jnp.clip(x, -clip, clip)
    scale = jnp.clip(jnp.max(jnp.abs(x), axis=(-1, -2), keepdims=True), 1e-6) / 127.0
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# W8A8: dynamic per-token activation quant + int8 MXU matmul
# ---------------------------------------------------------------------------
# The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; with per-token
# activation scales and per-out-channel weight scales this is the standard
# dynamic-quantization recipe (a performance extension beyond the reference's
# weight-only menu — opt-in via quantization mode "w8a8").


def quantize_weight_w8a8(w: jax.Array) -> dict:
    """[..., in, out] -> {"q8a": int8, "s": [..., out]}. The key name (not a
    string leaf) marks the w8a8 mode so the dict stays a valid lax.scan
    pytree."""
    out = quantize_weight_int8(w)
    return {"q8a": out["q"], "s": out["s"]}


@jax.custom_vjp
def _int8_dot_ste(xf: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """Dynamic per-token int8 quant + int8 MXU dot, with a STRAIGHT-THROUGH
    backward: the int8 tensors have no tangent space (round() kills the
    chain rule anyway), so the VJP treats y as xf @ (q·s) — the standard
    QLoRA recipe for training THROUGH a frozen quantized base. The primal
    is byte-identical to the inference path; the dequantized fp32 weight
    materializes only in the backward."""
    xs = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -128, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * s


def _int8_dot_fwd(xf, q, s):
    return _int8_dot_ste(xf, q, s), (q, s)


def _int8_dot_bwd(res, g):
    q, s = res
    deq = q.astype(jnp.float32) * s  # [in, out]
    gx = jnp.einsum("...o,io->...i", g, deq)
    # int8 primal -> float0 cotangent; the fp scale is frozen in every
    # training configuration (lora_trainable_mask), so zero is exact there
    return gx, np.zeros(q.shape, jax.dtypes.float0), jnp.zeros_like(s)


_int8_dot_ste.defvjp(_int8_dot_fwd, _int8_dot_bwd)


def w8a8_mm(x: jax.Array, w: dict, activation_clip: Optional[float] = None) -> jax.Array:
    """y = (x_q @ w_q) * x_scale * w_scale with dynamic per-token x quant.

    x: [..., S, in]; w["q8a"]: [in, out] int8 (per-layer slice inside scan).
    Accumulates in int32 on the MXU; rescale in fp32, output in x.dtype.
    Differentiable w.r.t. x via the straight-through VJP (QLoRA).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if activation_clip is not None:
        xf = jnp.clip(xf, -activation_clip, activation_clip)
    return _int8_dot_ste(xf, w["q8a"], w["s"]).astype(dtype)


def quantize_mixture_w8a8(mixture_params: dict) -> dict:
    """Quantize all linear weights of one mixture for the w8a8 path."""
    out = dict(mixture_params)
    for k in _QUANT_WEIGHT_KEYS:
        if k in out and not isinstance(out[k], dict):
            out[k] = quantize_weight_w8a8(out[k])
    return out


_VIT_WEIGHT_KEYS = ("q_w", "k_w", "v_w", "out_w", "fc1_w", "fc2_w", "qkv_w")


def quantize_vit_w8a8(vit_params: dict) -> dict:
    """Quantize a ViT tower's layer weights (patch embed / norms stay fp)."""
    out = dict(vit_params)
    layers = dict(out["layers"])
    for k in _VIT_WEIGHT_KEYS:
        if k in layers and not isinstance(layers[k], dict):
            layers[k] = quantize_weight_w8a8(layers[k])
    out["layers"] = layers
    return out


# ---------------------------------------------------------------------------
# W4A8: nibble-packed int4 weights + dynamic int8 activations (Pallas MXU)
# ---------------------------------------------------------------------------
# XLA cannot stream int4 weights (the unpack never fuses; see
# ops/pallas_int4_matmul.py for the measurements) — the packed weights are
# consumed by the fused Pallas kernel instead. Opt-in via mode "w4a8".
# GROUP-WISE symmetric int4 (default 512-row groups, GPTQ-style RTN) — the
# standard accuracy-credible int4 recipe; speed/memory tier for
# bandwidth-bound decode (Llama-7B: half the w8a8 weight bytes and ~1.2x the
# w8a8 end-to-end action rate on v5e).


_W4A8_CLIP_GRID = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7)


def quantize_weight_w4a8(w: jax.Array, group_size: int = 512,
                         mse_scale: bool = True, shards: int = 1) -> dict:
    """[K, N] -> {"q4": block-major packed int8 [NB, K//2, BN],
    "s": fp32 [G, N]} with GROUP-WISE scales: each of the G = K/group_size
    row-groups gets its own per-out-channel scale (GPTQ-style rounding —
    the accuracy-credible int4 recipe; G=1 degenerates to plain
    per-channel).

    ``mse_scale`` (default): instead of the max-abs scale (which minimizes
    clipping but maximizes the rounding step — the classic int4 RTN
    weakness on Gaussian-ish weights), each (group, out-channel) cell
    searches a small clip grid and keeps the scale minimizing its own
    reconstruction MSE. Data-free, same {"q4", "s"} format, quantization-
    time only; measured -20-25% weight RMSE at g=512/128 (see
    docs/results/quant_closed_loop_v5e.md for the closed-loop follow-up).

    N is zero-padded to NB*BN (pick_block_layout minimizes the padding) and
    the packed bytes are stored block-major so every kernel DMA is one
    contiguous chunk; "s" keeps the exact N (w4a8_mm slices the output back).

    ``shards`` pre-lays the packing for ``shards``-way tensor parallelism
    (NB divides evenly; see repack_w4a8 for re-laying an existing dict).
    """
    from blurr_tpu.ops.pallas_int4_matmul import (
        pack_int4,
        pick_block_layout,
        pick_group_size,
        to_block_major,
    )

    assert w.ndim == 2 and w.shape[0] % 2 == 0, w.shape
    k, n = w.shape
    g = pick_group_size(k, group_size)
    wf = w.astype(jnp.float32).reshape(k // g, g, n)
    amax = jnp.clip(jnp.max(jnp.abs(wf), axis=1), 1e-6)  # [G, N]
    if mse_scale:
        scale = amax / 7.0
        q = jnp.clip(jnp.round(wf / scale[:, None, :]), -8, 7)
        best = jnp.sum((q * scale[:, None, :] - wf) ** 2, axis=1)
        for c in _W4A8_CLIP_GRID[1:]:
            s_c = amax * (c / 7.0)
            q_c = jnp.clip(jnp.round(wf / s_c[:, None, :]), -8, 7)
            e_c = jnp.sum((q_c * s_c[:, None, :] - wf) ** 2, axis=1)
            take = e_c < best  # [G, N]
            best = jnp.where(take, e_c, best)
            scale = jnp.where(take, s_c, scale)
            q = jnp.where(take[:, None, :], q_c, q)
    else:
        scale = amax / 7.0
        q = jnp.clip(jnp.round(wf / scale[:, None, :]), -8, 7)
    q = q.reshape(k, n).astype(jnp.int8)
    bn, n_pad = pick_block_layout(n, shards)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
    return {"q4": to_block_major(pack_int4(q), bn), "s": scale.astype(jnp.float32)}


def repack_w4a8(w: dict, shards: int) -> dict:
    """Losslessly re-lay a {"q4", "s"} dict for ``shards``-way tensor
    parallelism: the packed bytes are re-padded and re-blocked so the
    block-major NB axis divides ``shards`` (``pick_block_layout(n,
    shards)``) and each shard owns whole contiguous column blocks. The int4
    values are untouched — nibbles pack along K, so column relayout never
    splits a byte — and the group scales carry over as-is. Handles stacked
    [L, ...] leaves; a layout that already divides returns unchanged."""
    from blurr_tpu.ops.pallas_int4_matmul import (
        from_block_major,
        pick_block_layout,
        to_block_major,
    )

    q4, s = w["q4"], w["s"]
    n = s.shape[-1]
    nb, bn = q4.shape[-3], q4.shape[-1]
    bn2, n_pad2 = pick_block_layout(n, shards)
    if bn2 == bn and n_pad2 == nb * bn:
        return w
    flat = from_block_major(q4)[..., :n]  # drop the old layout's padding
    if n_pad2 != n:
        pad = [(0, 0)] * (flat.ndim - 1) + [(0, n_pad2 - n)]
        flat = jnp.pad(flat, pad)
    out = dict(w)
    out["q4"] = to_block_major(flat, bn2)
    return out


def repack_w4a8_tree(params, shards: int):
    """``repack_w4a8`` over every w4a8 dict in a parameter pytree.
    Identity-preserving: untouched subtrees come back as the same objects
    and aliased (tied) dicts stay aliased, so shard_params' tie detection
    still works downstream."""
    if shards <= 1:
        return params
    seen: dict = {}

    def walk(t):
        if id(t) in seen:
            return seen[id(t)]
        if isinstance(t, dict):
            if "q4" in t:
                r = repack_w4a8(t, shards)
            else:
                new = {k: walk(v) for k, v in t.items()}
                r = new if any(new[k] is not t[k] for k in t) else t
        else:
            r = t
        seen[id(t)] = r
        return r

    return walk(params)


def _w4a8_deq(q4: jax.Array, s: jax.Array, k: int) -> jax.Array:
    """fp32 [K, N] weight from the block-major packed int4 + group scales."""
    from blurr_tpu.ops.pallas_int4_matmul import (
        from_block_major,
        unpack_int4_reference,
    )

    groups, n = s.shape
    wq = unpack_int4_reference(from_block_major(q4))[:, :n]
    return wq.astype(jnp.float32) * jnp.repeat(s, k // groups, axis=0)


@jax.custom_vjp
def _int4_dot_ste(xf: jax.Array, q4: jax.Array, s: jax.Array) -> jax.Array:
    """Group-wise int4 matmul (Pallas on TPU; dequantized fp32 elsewhere)
    with the same straight-through VJP as ``_int8_dot_ste`` — the Pallas
    call has no autodiff rule, and y ≈ xf @ W_deq is the QLoRA backward."""
    xs = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -128, 127).astype(jnp.int8)
    lead = xf.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    k = xf.shape[-1]
    groups, n = s.shape
    nb, _, bn = q4.shape
    n_pad = nb * bn
    # BLURR_INT4_FORCE: "" (backend decides) / "interpret" (run the Pallas
    # kernel + its GSPMD rule in interpret mode — how the 8-device CPU mesh
    # tests exercise the REAL tensor-parallel lowering) / "deq"
    force = os.environ.get("BLURR_INT4_FORCE", "")
    on_tpu = jax.default_backend() == "tpu"
    if force == "deq" or (not on_tpu and force != "interpret"):
        # CPU/test path: dequantized fp32 matmul — mathematically identical
        # to the kernel's per-group int32 dots ((x_g @ w_g)*s_g == x_g @
        # (w_g*s_g) since s_g is constant over each group's rows)
        y = xq.astype(jnp.float32) @ _w4a8_deq(q4, s, k)
        return y * xs
    from blurr_tpu.ops.pallas_int4_matmul import int4_matmul_spmd

    s_pad = s if n_pad == n else jnp.pad(s, ((0, 0), (0, n_pad - n)))
    # the custom_partitioning wrapper: single-device jit lowers exactly like
    # the raw kernel; under a TP mesh each chip runs the unchanged kernel on
    # its own column blocks (pallas_int4_matmul.int4_matmul_spmd)
    y = int4_matmul_spmd(xq.reshape(m, k), q4, s_pad, interpret=not on_tpu)
    y = y[:, :n] * xs.reshape(m, 1)
    return y.reshape(*lead, n)


def _int4_dot_fwd(xf, q4, s):
    return _int4_dot_ste(xf, q4, s), (q4, s)


def _int4_dot_bwd(res, g):
    q4, s = res
    deq = _w4a8_deq(q4, s, 2 * q4.shape[1])  # q4 packs K//2 rows
    gx = jnp.einsum("...o,io->...i", g, deq)
    return gx, np.zeros(q4.shape, jax.dtypes.float0), jnp.zeros_like(s)


_int4_dot_ste.defvjp(_int4_dot_fwd, _int4_dot_bwd)


def w4a8_mm(x: jax.Array, w: dict, activation_clip: Optional[float] = None) -> jax.Array:
    """y = sum_g (x_q_g @ unpack(w_q4)_g) * s_g * x_scale via the Pallas
    kernel (group-wise int4).

    x: [..., K]; w["q4"]: block-major [NB, K//2, BN] packed int4 (per-layer
    slice inside scan), w["s"]: [G, N] exact-width group scales.
    Differentiable w.r.t. x via the straight-through VJP (QLoRA).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if activation_clip is not None:
        xf = jnp.clip(xf, -activation_clip, activation_clip)
    return _int4_dot_ste(xf, w["q4"], w["s"]).astype(dtype)


def quantize_mixture_w4a8(mixture_params: dict, group_size: int = 512,
                          int8_keys: tuple = ()) -> dict:
    """Quantize all linear weights of one mixture for the w4a8 path.

    Stacked [L, K, N] weights are quantized per layer (vmap) so each layer
    keeps its own scales; scan slices the leading axis as usual.

    Accuracy knobs (verdict r3 Next #5 — the measured w4a8 blocker is
    quantization noise, 6.6x w8a8's closed-loop action MAE):
    - ``group_size``: finer row-groups than the default 512 give each
      group its own per-out-channel scale (more scales, less rounding
      error; the Pallas kernel statically unrolls one int32 dot per
      group, so very fine groups trade latency).
    - ``int8_keys``: weight names to keep in W8A8 instead (mixed-
      precision: protect the most quantization-sensitive matrices — mm()
      dispatches per weight dict, so int4 and int8 coexist in one scan).
    """
    import functools

    qf = functools.partial(quantize_weight_w4a8, group_size=group_size)
    out = dict(mixture_params)
    for k in _QUANT_WEIGHT_KEYS:
        if k in out and not isinstance(out[k], dict):
            w = out[k]
            if k in tuple(int8_keys):
                out[k] = quantize_weight_w8a8(w)
            else:
                # lax.map, NOT vmap, over stacked [L, K, N] weights: the
                # mse_scale clip search holds several fp32 copies of the
                # weight at once, and vmap materializes that for ALL L
                # layers simultaneously (~10 GB for the 18-layer Gemma MLP
                # next to the resident bf16 tree — a measured 16 GB-chip
                # OOM). Sequential per-layer keeps peak at one layer.
                out[k] = jax.lax.map(qf, w) if w.ndim == 3 else qf(w)
    return out
