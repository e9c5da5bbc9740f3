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
    # fp32 island (the reference computes this in model dtype only because
    # torch upcasts the arange; bf16 arange cannot even represent integers
    # > 256, corrupting the frequencies for dim > 512)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1).astype(t.dtype)


class GaussianFourierFeatureTransform:
    """Random Fourier features (parity surface: reference
    src/model/vla/modules.py:56-75; unused in the eval path but part of the
    module inventory). Functional: holds the fixed projection matrix."""

    def __init__(self, input_dim: int, embed_dim: int = 256, scale: float = 10.0,
                 rng=None):
        import jax

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.b = jax.random.normal(rng, (input_dim, embed_dim)) * scale

    def __call__(self, v: jax.Array) -> jax.Array:
        x_proj = (2 * jnp.pi * v) @ self.b.astype(v.dtype)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)
