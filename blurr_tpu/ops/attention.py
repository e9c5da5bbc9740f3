"""Grouped-query attention with Gemma soft-clamp semantics.

This is the XLA reference path; the Pallas flash kernel in
``blurr_tpu.ops.pallas_attention`` implements the same math block-wise and is
selected by the dispatcher for large prefills. Numerics locked to reference
src/model/vla/joint_model.py:272-288:

    logits = (q @ k^T) / sqrt(head_dim)
    logits = tanh(logits / 50.0) * 50.0          (soft clamp, optional)
    logits += additive_mask
    weights = softmax(logits, fp32) -> cast back
    out = weights @ v

GQA is expressed by grouping query heads over KV heads instead of the
reference's ``repeat_kv`` materialization — with Gemma's 8 Q / 1 KV heads this
avoids an 8x broadcast of K/V through HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_SOFTCLAMP = 50.0


def split_heads(x, n_heads: int, head_dim: int):
    """[B, S, n*d] -> [B, n, S, d] (the head layout every attention op here
    consumes)."""
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, head_dim).transpose(0, 2, 1, 3)


def merge_heads(x):
    """[B, n, S, d] -> [B, S, n*d]."""
    b, nh, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)


def grouped_attention(
    q: jax.Array,  # [B, NH, Sq, D]
    k: jax.Array,  # [B, KVH, Skv, D]
    v: jax.Array,  # [B, KVH, Skv, D]
    mask: Optional[jax.Array] = None,  # bool [B, Sq, Skv]
    softclamp: Optional[float] = DEFAULT_SOFTCLAMP,
    scale: Optional[float] = None,
) -> jax.Array:
    """Returns [B, NH, Sq, D]."""
    b, nh, sq, d = q.shape
    kvh = k.shape[1]
    assert nh % kvh == 0, (nh, kvh)
    g = nh // kvh
    if scale is None:
        scale = d**-0.5

    qg = q.reshape(b, kvh, g, sq, d)
    logits = jnp.einsum(
        "bkgqd,bksd->bkgqs", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if softclamp is not None:
        logits = jnp.tanh(logits / softclamp) * softclamp
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :, :], logits, big_neg)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgqs,bksd->bkgqd", weights, v)
    return out.reshape(b, nh, sq, d)


def mha(
    q: jax.Array,  # [B, NH, Sq, D]
    k: jax.Array,  # [B, NH, Skv, D]
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain multi-head attention (SigLIP towers): fp32 softmax, no clamp."""
    return grouped_attention(q, k, v, mask=mask, softclamp=None, scale=scale)


def mha_flat(
    q: jax.Array,  # [B, S, NH, HD]
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Unmasked MHA over the [B, S, NH, HD] layout (no head transposes —
    measured ~12% faster than the transposed layout on the SigLIP tower).
    Returns [B, S, NH*HD]."""
    b, s, nh, hd = q.shape
    if scale is None:
        scale = hd**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    return out.reshape(b, s, nh * hd)
