"""Llama decoder (OpenVLA's LLM backbone), TPU-native.

Llama-2-7B format: 32 layers / 4096 hidden / 32 heads (MHA; GQA supported) /
SwiGLU 11008 / Llama RMSNorm (weight applied AFTER the downcast, unlike
Gemma's (1+w)-before-downcast) / fp32 RoPE theta 10000.

Decode design: prefill writes a preallocated [L, B, KVH, max_len, D] cache at
offset 0; the greedy action-token generation is a ``lax.scan`` over single
token steps inside one jit — the whole predict_action is a single device
program (the reference goes through HF generate with per-token dispatch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import grouped_attention
from blurr_tpu.ops.attention import merge_heads as _merge_heads
from blurr_tpu.ops.attention import split_heads as _split_heads
from blurr_tpu.ops.quant import (
    _QUANT_WEIGHT_KEYS,
    mm,
    quantize_mixture_w4a8,
    quantize_mixture_w8a8,
    quantize_weight_w4a8,
    quantize_weight_w8a8,
)
from blurr_tpu.ops.rotary import apply_rope, rope_cos_sin


@dataclass(frozen=True)
class LlamaSpec:
    vocab_size: int = 32064
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    rope_theta: float = 10000.0
    eps: float = 1e-5
    pad_token_id: int = 32000
    # Qwen2-family knobs (MiniVLA's prismatic backbone is Qwen2.5-0.5B:
    # attention QKV biases + lm_head tied to the embedding matrix; the
    # reference reaches that model only through the external openvla-mini
    # repo, scripts/eval_prismatic_vla_simpler.py:240-281)
    qkv_bias: bool = False
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _maybe_add_bias_leaves(layers: Dict, spec: LlamaSpec, dtype) -> None:
    """Attach zero-init Qwen2 attention-bias leaves when the spec asks."""
    if spec.qkv_bias:
        nl, nh, kvh, hd = (spec.num_layers, spec.num_heads,
                           spec.num_kv_heads, spec.head_dim)
        layers["q_b"] = jnp.zeros((nl, nh * hd), dtype)
        layers["k_b"] = jnp.zeros((nl, kvh * hd), dtype)
        layers["v_b"] = jnp.zeros((nl, kvh * hd), dtype)


def llama_rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Llama semantics: normalize in fp32, downcast, THEN scale by w."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dtype) * weight


def init_llama_params(rng: jax.Array, spec: LlamaSpec, dtype=jnp.float32) -> Dict:
    nl, h, inter = spec.num_layers, spec.hidden_size, spec.intermediate_size
    nh, kvh, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    keys = iter(jax.random.split(rng, 12))

    def stack(key, fan_in, shape):
        return jax.random.normal(key, (nl, *shape), dtype) * (fan_in**-0.5)

    params = {
        "embed_tokens": jax.random.normal(next(keys), (spec.vocab_size, h), dtype)
        * (h**-0.5),
        "layers": {
            "q_w": stack(next(keys), h, (h, nh * hd)),
            "k_w": stack(next(keys), h, (h, kvh * hd)),
            "v_w": stack(next(keys), h, (h, kvh * hd)),
            "o_w": stack(next(keys), nh * hd, (nh * hd, h)),
            "gate_w": stack(next(keys), h, (h, inter)),
            "up_w": stack(next(keys), h, (h, inter)),
            "down_w": stack(next(keys), inter, (inter, h)),
            "input_norm": jnp.ones((nl, h), dtype),
            "post_norm": jnp.ones((nl, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    _maybe_add_bias_leaves(params["layers"], spec, dtype)
    if not spec.tie_word_embeddings:
        params["lm_head"] = jax.random.normal(
            next(keys), (h, spec.vocab_size), dtype
        ) * (h**-0.5)
    return params


def alloc_cache(spec: LlamaSpec, batch: int, max_len: int, dtype):
    shape = (spec.num_layers, batch, spec.num_kv_heads, max_len, spec.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def forward(
    params: Dict,
    spec: LlamaSpec,
    embeds: jax.Array,  # [B, S, H]
    position_ids: jax.Array,  # [B, S]
    mask: jax.Array,  # bool [B, S, max_len]  (covers the cache buffer)
    cache: Tuple[jax.Array, jax.Array],
    cache_offset: jax.Array,  # scalar int32: write position
    remat: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One forward over S tokens with cache write at ``cache_offset``.
    Returns (hidden [B, S, H], updated cache). Used for both the prompt
    prefill (S = prompt_len) and scan decode steps (S = 1).

    ``remat``: rematerialize each layer in the backward pass
    (``jax.checkpoint`` around the scanned body) — the training-memory
    lever: per-layer activations ([B, S, H] x ~6 tensors x 32 layers at
    7B) are recomputed instead of stored. No effect on inference."""
    nh, kvh, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    eps = spec.eps
    cos, sin = rope_cos_sin(position_ids, hd, spec.rope_theta)
    k_buf, v_buf = cache

    def layer(h, xs):
        lp, kc, vc = xs
        x = llama_rms_norm(h, lp["input_norm"], eps)
        qh, kh, vh = mm(x, lp["q_w"]), mm(x, lp["k_w"]), mm(x, lp["v_w"])
        if "q_b" in lp:  # Qwen2-style attention biases
            qh, kh, vh = qh + lp["q_b"], kh + lp["k_b"], vh + lp["v_b"]
        q = apply_rope(_split_heads(qh, nh, hd), cos, sin)
        k = apply_rope(_split_heads(kh, kvh, hd), cos, sin)
        v = _split_heads(vh, kvh, hd)
        kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, cache_offset, 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, cache_offset, 0))
        attn = grouped_attention(q, kc, vc, mask, softclamp=None)
        h = h + mm(_merge_heads(attn), lp["o_w"])
        x = llama_rms_norm(h, lp["post_norm"], eps)
        h = h + mm(jax.nn.silu(mm(x, lp["gate_w"])) * mm(x, lp["up_w"]), lp["down_w"])
        return h, (kc, vc)

    body = jax.checkpoint(layer) if remat else layer
    h, (k_new, v_new) = jax.lax.scan(body, embeds, (params["layers"], k_buf, v_buf))
    return h, (k_new, v_new)


def final_hidden(params: Dict, spec: LlamaSpec, h: jax.Array) -> jax.Array:
    return llama_rms_norm(h, params["final_norm"], spec.eps)


def logits(params: Dict, spec: LlamaSpec, h: jax.Array) -> jax.Array:
    hf = final_hidden(params, spec, h)
    if "lm_head" in params:
        return mm(hf, params["lm_head"])
    # tied embeddings (Qwen2-0.5B / MiniVLA backbone)
    return hf @ params["embed_tokens"].T.astype(hf.dtype)


def _has_fp_lm_head(params: Dict) -> bool:
    """True when an unquantized lm_head tensor is present (absent for tied-
    embedding models; a dict means it is already quantized)."""
    return "lm_head" in params and not isinstance(params["lm_head"], dict)


def _materialize_tied_head(params: Dict, qfn) -> Dict:
    """For tied-embedding models the decode-logits matmul reads the full
    [H, V] embedding transpose in fp every token — usually the single
    largest weight read in a 0.5B-class decode. Materialize a quantized
    copy as lm_head (embed_tokens stays fp for the gather); `logits` then
    takes the quantized path."""
    out = dict(params)
    out["lm_head"] = qfn(jnp.swapaxes(params["embed_tokens"], 0, 1))
    return out


def init_llama_params_w8a8(rng: jax.Array, spec: LlamaSpec, dtype=jnp.bfloat16) -> Dict:
    """Random init DIRECTLY in w8a8 form: the int8 weights are generated
    without ever materializing the bf16 tree (quantizing a full bf16 7B tree
    after init would transiently exceed 16GB HBM)."""
    nl, h, inter = spec.num_layers, spec.hidden_size, spec.intermediate_size
    nh, kvh, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    keys = iter(jax.random.split(rng, 16))

    def q(shape, fan_in):
        return {
            "q8a": jax.random.randint(next(keys), (nl, *shape), -127, 128, jnp.int8),
            "s": jnp.full((nl, shape[-1]), fan_in**-0.5 / 127.0, jnp.float32),
        }

    params = {
        "embed_tokens": jax.random.normal(next(keys), (spec.vocab_size, h), dtype)
        * (h**-0.5),
        "layers": {
            "q_w": q((h, nh * hd), h),
            "k_w": q((h, kvh * hd), h),
            "v_w": q((h, kvh * hd), h),
            "o_w": q((nh * hd, h), nh * hd),
            "gate_w": q((h, inter), h),
            "up_w": q((h, inter), h),
            "down_w": q((inter, h), inter),
            "input_norm": jnp.ones((nl, h), dtype),
            "post_norm": jnp.ones((nl, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
        # tied-embedding specs still get a (quantized) head: the quantizers
        # materialize one from embed_tokens.T for the decode-logits matmul
        "lm_head": {
            "q8a": jax.random.randint(
                next(keys), (h, spec.vocab_size), -127, 128, jnp.int8
            ),
            "s": jnp.full((spec.vocab_size,), h**-0.5 / 127.0, jnp.float32),
        },
    }
    _maybe_add_bias_leaves(params["layers"], spec, dtype)
    return params


def quantize_llama_w8a8(params: Dict, quantize_lm_head: bool = True) -> Dict:
    """W8A8-quantize the decoder weights (and optionally lm_head): halves the
    weight reads that dominate the memory-bound action-token decode, and runs
    the matmuls on the 2x-rate int8 MXU. Embeddings stay fp (gather).

    NOTE on accuracy: greedy argmax fidelity cannot be assessed on random
    init (near-uniform logits make token choices noise-sensitive); with real
    checkpoints the peaked action-token logits make int8 argmax flips rare,
    but validate closed-loop success before production (for comparison, the
    Pi-0 flow path shows MAE 0.003 action deviation under the same scheme).
    """
    out = dict(params)
    out["layers"] = quantize_mixture_w8a8(params["layers"])
    if quantize_lm_head:
        if _has_fp_lm_head(params):
            out["lm_head"] = quantize_weight_w8a8(params["lm_head"])
        elif "lm_head" not in params:
            out = _materialize_tied_head(out, quantize_weight_w8a8)
    return out


def quantize_llama_streaming(params: Dict, mode: str,
                             quantize_lm_head: bool = True) -> Dict:
    """Memory-bounded quantization of an already-loaded 7B decoder.

    quantize_llama_w8a8/w4a8 make a full-stack fp32 transient per tensor
    (vmap over [L, K, N]: gate_w alone is ~5.8 GB fp32) while the ~13.5 GB
    bf16 tree is still resident — that OOMs the 16 GB chip. This variant
    (a) quantizes each stacked tensor with lax.map so the fp32 transient is
    one LAYER (~0.2 GB), (b) processes tensors smallest-first, and
    (c) DELETES each bf16 source buffer as soon as its quantized form
    exists. The input tree is consumed: its weight buffers are freed, so
    drop every other reference to it. Use for checkpoint-loaded 7B models
    (random-init benchmarking should init directly in quantized form via
    init_llama_params_w8a8/w4a8 instead).
    """
    assert mode in ("w8a8", "w4a8"), mode
    qfn = quantize_weight_w8a8 if mode == "w8a8" else quantize_weight_w4a8
    out = dict(params)
    layers = dict(params["layers"])
    targets = [k for k in _QUANT_WEIGHT_KEYS if k in layers
               and not isinstance(layers[k], dict)]
    def fence(q):
        # fetch ONE element of the quantized tensor: on the axon tunnel
        # jax.block_until_ready is a no-op (only data fetches block, see
        # CLAUDE.md), so this is the fence that guarantees the quantized
        # buffer is materialized before the bf16 source is deleted
        key = "q8a" if "q8a" in q else "q4"
        int(q[key][(0,) * q[key].ndim])

    for k in sorted(targets, key=lambda k: layers[k].size):
        w = layers[k]
        layers[k] = jax.lax.map(qfn, w) if w.ndim == 3 else qfn(w)
        fence(layers[k])
        w.delete()
    out["layers"] = layers
    if quantize_lm_head:
        if _has_fp_lm_head(params):
            head = params["lm_head"]
            out["lm_head"] = qfn(head)
            fence(out["lm_head"])
            head.delete()
        elif "lm_head" not in params:
            # tied embeddings: materialize a quantized head copy; the fp
            # embedding stays (the gather path needs it)
            out = _materialize_tied_head(out, qfn)
            fence(out["lm_head"])
    return out


def quantize_llama_w4a8(params: Dict, quantize_lm_head: bool = True) -> Dict:
    """W4A8-quantize the decoder weights: int4 nibble-packed storage (half
    the w8a8 bytes; a 7B decoder fits in ~3.5 GB) consumed by the fused
    Pallas kernel (ops/pallas_int4_matmul.py). On v5e the bandwidth-bound
    action-token decode runs ~1.2-1.4x faster than w8a8 per GEMV.

    Accuracy: per-out-channel int4 is a 15-level quantizer — noticeably
    coarser than int8. Opt-in speed/memory tier; validate closed-loop
    success with real checkpoints before production.
    """
    out = dict(params)
    out["layers"] = quantize_mixture_w4a8(params["layers"])
    if quantize_lm_head:
        if _has_fp_lm_head(params):
            out["lm_head"] = quantize_weight_w4a8(params["lm_head"])
        elif "lm_head" not in params:
            out = _materialize_tied_head(out, quantize_weight_w4a8)
    return out


def init_llama_params_w4a8(rng: jax.Array, spec: LlamaSpec, dtype=jnp.bfloat16) -> Dict:
    """Random init DIRECTLY in packed-w4a8 form (the bf16->int4 quantize of a
    full 7B tree would transiently exceed 16GB HBM on one chip). Random int8
    bytes are random nibble pairs, so the packed tensors are statistically
    equivalent to packing a random int4 tree."""
    nl, h, inter = spec.num_layers, spec.hidden_size, spec.intermediate_size
    nh, kvh, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    keys = iter(jax.random.split(rng, 16))

    from blurr_tpu.ops.pallas_int4_matmul import pick_block_layout, pick_group_size

    def q(shape, fan_in):
        k, n = shape
        bn, n_pad = pick_block_layout(n)
        groups = k // pick_group_size(k)
        return {
            "q4": jax.random.randint(
                next(keys), (nl, n_pad // bn, k // 2, bn), -128, 128, jnp.int8
            ),
            "s": jnp.full((nl, groups, n), fan_in**-0.5 / 7.0, jnp.float32),
        }

    params = {
        "embed_tokens": jax.random.normal(next(keys), (spec.vocab_size, h), dtype)
        * (h**-0.5),
        "layers": {
            "q_w": q((h, nh * hd), h),
            "k_w": q((h, kvh * hd), h),
            "v_w": q((h, kvh * hd), h),
            "o_w": q((nh * hd, h), nh * hd),
            "gate_w": q((h, inter), h),
            "up_w": q((h, inter), h),
            "down_w": q((inter, h), inter),
            "input_norm": jnp.ones((nl, h), dtype),
            "post_norm": jnp.ones((nl, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
        # see init_llama_params_w8a8 on tied-embedding specs
        "lm_head": _w4_head(next(keys), h, spec.vocab_size),
    }
    _maybe_add_bias_leaves(params["layers"], spec, dtype)
    return params


def _w4_head(key, h: int, vocab: int) -> Dict:
    from blurr_tpu.ops.pallas_int4_matmul import pick_block_layout, pick_group_size

    bn, n_pad = pick_block_layout(vocab)
    groups = h // pick_group_size(h)
    return {
        "q4": jax.random.randint(key, (n_pad // bn, h // 2, bn), -128, 128, jnp.int8),
        "s": jnp.full((groups, vocab), h**-0.5 / 7.0, jnp.float32),
    }


def causal_prefill_mask(
    attn_valid: jax.Array, max_len: int
) -> jax.Array:
    """Causal mask over a preallocated buffer: [B, S] validity -> bool
    [B, S, max_len] where position i attends valid positions j <= i."""
    b, s = attn_valid.shape
    rows = jnp.arange(s)[None, :, None]
    cols = jnp.arange(max_len)[None, None, :]
    causal = cols <= rows
    valid = jnp.pad(
        attn_valid.astype(bool), ((0, 0), (0, max_len - s))
    )[:, None, :]
    return causal & valid


def greedy_generate(
    params: Dict,
    spec: LlamaSpec,
    prompt_embeds: jax.Array,  # [B, S, H]
    attn_valid: jax.Array,  # [B, S] validity; right-padded ragged prompts are
    # supported: per-example decode positions continue at n_valid and pad
    # columns stay masked throughout prefill + decode.
    num_new_tokens: int,
    max_len: Optional[int] = None,
) -> jax.Array:
    """Greedy decode of ``num_new_tokens`` tokens in ONE jittable program:
    prefill + lax.scan over single-token steps. Returns [B, num_new_tokens]
    token ids."""
    b, s, _ = prompt_embeds.shape
    max_len = max_len or (s + num_new_tokens)
    cache = alloc_cache(spec, b, max_len, prompt_embeds.dtype)

    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    mask = causal_prefill_mask(attn_valid, max_len)
    h, cache = forward(params, spec, prompt_embeds, pos, mask, cache, jnp.int32(0))
    # first token comes from the last VALID prompt position per example
    # (h[:, -1] would read a pad position under right padding)
    last_idx = jnp.sum(attn_valid.astype(jnp.int32), axis=-1) - 1  # [B]
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)  # [B,1,H]
    first_tok = jnp.argmax(logits(params, spec, h_last)[:, -1], axis=-1)  # [B]

    # cache-column validity for decode steps: prompt columns keep their
    # attn_valid bit (pad positions' K/V must stay masked), generated
    # columns become valid as they are written
    valid_cols = jnp.pad(
        attn_valid.astype(bool), ((0, 0), (0, max_len - s)), constant_values=True
    )[:, None, :]

    n_valid = jnp.sum(attn_valid.astype(jnp.int32), axis=-1)  # [B]

    def step(carry, i):
        tok, cache = carry
        emb = params["embed_tokens"][tok][:, None, :].astype(prompt_embeds.dtype)
        # cache WRITES land at the static column s + i for every example (a
        # fixed-shape dynamic_update_slice), but RoPE positions are
        # per-example: generated token i continues at n_valid + i, so a
        # right-padded prompt gets no positional gap. The pad columns between
        # n_valid and s stay masked via valid_cols, so relative distances are
        # consistent within each example.
        offset = s + i
        pos = (n_valid + i)[:, None].astype(jnp.int32)  # [B, 1]
        cols = jnp.arange(max_len)[None, None, :]
        m = jnp.broadcast_to(cols <= offset, (b, 1, max_len)) & valid_cols
        h, cache = forward(
            params, spec, emb, pos, m, cache, jnp.asarray(offset, jnp.int32)
        )
        nxt = jnp.argmax(logits(params, spec, h[:, -1]), axis=-1)
        return (nxt, cache), tok

    (last, _), toks = jax.lax.scan(
        step, (first_tok, cache), jnp.arange(num_new_tokens - 1)
    )
    toks = jnp.moveaxis(toks, 0, 1)  # [B, n-1] generated before `last`
    return jnp.concatenate([toks, last[:, None]], axis=1)


def relayout_qkv_for_jacobi(params: Dict) -> Dict:
    """On-device relayout of the stacked attention projections for the
    Jacobi decode program: q_w/k_w/v_w [L, H, H] move to the transposed
    device layout (major_to_minor (0, 2, 1), contracting dim minor).

    Why: XLA's small-S attention dots want the weight transposed. In the
    AR program the conversion lands per-layer inside the decode scan
    (3 x 32 MB temps); in the Jacobi program the extra outer while loop
    makes the whole stacked tree loop-invariant and the conversion is
    hoisted to 3 x 1 GB entry copies — a compile-time OOM for bf16-7B on
    a 16 GB chip (measured 2026-08-19: 17.06 G of 15.75 G). With the
    arguments ALREADY in the transposed layout the program needs no
    conversion at all: temp drops to 0.15 GB and the program fits. The
    same transposed arguments make the AR program compile-OOM (it wants
    them natural at entry), so the layout must FOLLOW THE DECODE MODE:
    call this once at load time in a Jacobi-decoding process; never mix
    AR and Jacobi on the same 7B param tree in one process (small models
    fit either way). Transposing o/gate/up/down too was probed and
    compile-OOMs (the prefill wants those natural); qkv-only is the
    measured sweet spot.

    No-ops for quantized trees (dict leaves — int8 programs have 8 GB of
    headroom and need no layout help) and on backends without custom
    device layouts (CPU tests). Bit-identical outputs either way.

    DONATION SEMANTICS: the input tree's q/k/v entries are released one
    by one as each transposed copy lands (set to None in the input dict).
    Holding both full-precision trees alive would itself OOM a 16 GB chip
    at 7B scale (13.9 + 3 GB); the caller must rebind to the returned
    tree. On a failed relayout (CPU, sharded trees) the input is returned
    untouched — already-converted leaves are transposed back to the
    natural layout first; if THAT allocation fails too, the tree is
    half-converted and a RuntimeError tells the caller to reload."""
    layers = params.get("llama", {}).get("layers", {})
    out = dict(params)
    out["llama"] = dict(params["llama"])
    out["llama"]["layers"] = dict(layers)

    def _undo(reason: BaseException | None) -> Dict:
        # Earlier keys were already donated (original freed, only the
        # TRANSPOSED copy survives in `out`). "Untouched" must mean layout
        # too — a mixed-layout tree makes the later decode program hoist
        # GB-scale conversion copies and compile-OOM with no hint why — so
        # restore by transposing each donated leaf back to the default
        # layout. If even that allocation fails, the tree is genuinely
        # half-converted: raise instead of returning a lie.
        for kk in ("q_w", "k_w", "v_w"):
            if layers.get(kk) is not None:
                continue  # not donated yet
            t = out["llama"]["layers"][kk]
            try:
                from jax.experimental.layout import Format, Layout
                from jax.sharding import SingleDeviceSharding

                dev = list(t.devices())[0]
                nat = Format(Layout((0, 1, 2)), SingleDeviceSharding(dev))
                layers[kk] = jax.device_put(t, nat)
            except Exception as undo_exc:
                raise RuntimeError(
                    f"relayout_qkv_for_jacobi failed mid-way and could not "
                    f"restore {kk!r} to the natural layout — the param tree "
                    f"is half-converted; reload the weights"
                ) from (reason or undo_exc)
        return params

    for k in ("q_w", "k_w", "v_w"):
        w = layers.get(k)
        if w is None or isinstance(w, dict) or w.ndim != 3:
            continue
        try:
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            devs = list(w.devices())
            if len(devs) != 1:  # tp/dp-sharded trees: leave the GSPMD
                return _undo(None)  # layout to the partitioner
            dev = devs[0]
            fmt = Format(Layout((0, 2, 1)), SingleDeviceSharding(dev))
            new = jax.device_put(w, fmt)
        except Exception as exc:  # CPU / backends without layout control
            return _undo(exc)
        out["llama"]["layers"][k] = new
        layers[k] = None  # free the original before the next 1 GB copy
        del w
    return out


def greedy_generate_jacobi(
    params: Dict,
    spec: LlamaSpec,
    prompt_embeds: jax.Array,  # [B, S, H]
    attn_valid: jax.Array,  # [B, S] (right-padded ragged prompts supported,
    # same semantics as greedy_generate)
    num_new_tokens: int,
    max_len: Optional[int] = None,
    return_iters: bool = False,
    init_guess: Optional[jax.Array] = None,
    num_iters: Optional[int] = None,
):
    """LOSSLESS self-speculative greedy decode via Jacobi fixed-point
    iteration: instead of ``num_new_tokens`` sequential single-token steps
    (each a full weight-bound GEMV pass over the LLM — the dominant cost of
    OpenVLA's 7-token action decode), guess the whole continuation, verify
    every position in ONE multi-token forward (weights read once, tokens
    ride the MXU), and repeat until the guess is a fixed point of the
    greedy map.

    Exactness: token 0 comes from the prompt prefill (always exact), and
    after iteration k the first k+1 tokens equal ``greedy_generate``'s
    output by induction (each verified position conditions only on the
    already-exact prefix), so the fixed point IS the greedy chain and the
    loop needs at most ``num_new_tokens - 1`` iterations. Convergence is
    typically much faster when tokens depend mostly on the prompt (VLA
    action dims are near-independent given the image), making the expected
    cost ~2 weight passes instead of ``num_new_tokens``.

    ``init_guess`` [B, num_new_tokens] warm-starts the iteration (position
    0 is always replaced by the exact prefill token): ANY seed converges
    to the same greedy fixed point, but a close one converges in fewer
    sweeps — in a robot control loop the PREVIOUS step's action tokens are
    the natural seed (consecutive actions are similar).

    ``num_iters`` (static) runs EXACTLY that many sweeps instead of
    iterating to the fixed point — the k-ladder instrument for latency
    work (a trained checkpoint converging in k sweeps pays the
    ``num_iters=k`` time). With ``num_iters >= num_new_tokens - 1`` the
    output is still exact; below that it is the truncated iterate (the
    first ``num_iters + 1`` tokens are exact by the induction above).

    Returns [B, num_new_tokens] token ids (bit-identical to
    ``greedy_generate``); with ``return_iters`` also the number of Jacobi
    iterations taken (traced scalar). Jittable."""
    b, s, _ = prompt_embeds.shape
    n = int(num_new_tokens)
    max_len = max_len or (s + n)
    cache = alloc_cache(spec, b, max_len, prompt_embeds.dtype)

    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    mask = causal_prefill_mask(attn_valid, max_len)
    h, cache = forward(params, spec, prompt_embeds, pos, mask, cache,
                       jnp.int32(0))
    last_idx = jnp.sum(attn_valid.astype(jnp.int32), axis=-1) - 1  # [B]
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
    first_tok = jnp.argmax(logits(params, spec, h_last)[:, -1], axis=-1)
    if n == 1:
        out = first_tok[:, None]
        return (out, jnp.int32(0)) if return_iters else out

    valid_cols = jnp.pad(
        attn_valid.astype(bool), ((0, 0), (0, max_len - s)),
        constant_values=True,
    )[:, None, :]
    n_valid = jnp.sum(attn_valid.astype(jnp.int32), axis=-1)  # [B]
    t = n - 1  # tail chunk: tokens 0..n-2 predict tokens 1..n-1

    # tail attention: query at cache column s+i sees cols <= s+i (causal
    # within the tail) and the prompt's valid columns
    cols = jnp.arange(max_len)[None, None, :]
    tail_mask = (cols <= (s + jnp.arange(t))[None, :, None]) & valid_cols
    tail_mask = jnp.broadcast_to(tail_mask, (b, t, max_len))
    # RoPE continues at each example's own prompt length (pad columns
    # between n_valid and s stay masked, same scheme as greedy_generate)
    tail_pos = (n_valid[:, None] + jnp.arange(t)[None, :]).astype(jnp.int32)

    def verify(guess, cache):
        """One Jacobi sweep: forward tokens guess[:, :-1] at columns
        s..s+t-1, argmax every position -> refreshed guess[:, 1:]."""
        emb = params["embed_tokens"][guess[:, :-1]].astype(
            prompt_embeds.dtype)
        h, cache = forward(params, spec, emb, tail_pos, tail_mask, cache,
                           jnp.int32(s))
        preds = jnp.argmax(logits(params, spec, h), axis=-1)  # [B, t]
        return jnp.concatenate([first_tok[:, None], preds], axis=1), cache

    # initial guess: token 0 exact; the rest from the caller's warm start
    # when given, else seeded with token 0 (any seed converges; a same-row
    # seed tends to be closer for action tokens)
    if init_guess is not None:
        init_guess = jnp.concatenate(
            [first_tok[:, None], init_guess[:, 1:].astype(first_tok.dtype)],
            axis=1,
        )
    else:
        init_guess = jnp.broadcast_to(first_tok[:, None], (b, n))

    def cond(carry):
        guess, _, converged, it = carry
        if num_iters is not None:
            return it < num_iters
        return (~converged) & (it < n - 1)

    def body(carry):
        guess, cache, _, it = carry
        new, cache = verify(guess, cache)
        return new, cache, jnp.all(new == guess), it + 1

    # the first sweep always runs (it also writes the tail K/V); converged
    # starts False so cond admits it
    guess, cache, converged, iters = jax.lax.while_loop(
        cond, body, (init_guess, cache, jnp.bool_(False), jnp.int32(0))
    )
    return (guess, iters) if return_iters else guess
