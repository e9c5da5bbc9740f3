"""Time / positional embedding primitives."""

import math

import jax
import jax.numpy as jnp


def sinusoidal_pos_emb(
    t: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Flow-time sinusoidal embedding [B] -> [B, dim] (sin half then cos half),
    matching reference src/model/vla/modules.py:9-22 (note the ``half_dim - 1``
    denominator)."""
    half_dim = dim // 2
    scale = math.log(max_period) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=t.dtype) * -scale)
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
