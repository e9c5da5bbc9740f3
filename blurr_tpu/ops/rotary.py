"""Rotary position embeddings, computed in float32 for full accuracy
(semantics of reference src/model/paligemma/modules.py:24-67 and
src/model/utils.py:4-16).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rope_cos_sin(
    position_ids: jax.Array,  # [B, S] int
    head_dim: int,
    base: float = 10000.0,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [B, S, head_dim] with the duplicated-half layout."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # [D/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, S, D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE to ``x`` [B, H, S, D] given cos/sin [B, S, D].

    The rotation itself runs in float32 and downcasts to x.dtype, matching the
    reference's fp32-RoPE policy inside a bf16 graph.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    cos = cos.astype(jnp.float32)[:, None, :, :]
    sin = sin.astype(jnp.float32)[:, None, :, :]
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(dtype)
