"""Activation functions (tanh-approximated GELU to match Gemma/SigLIP)."""

import jax
import jax.numpy as jnp


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def geglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """Gemma GeGLU combiner: gelu_tanh(gate) * up."""
    return gelu_tanh(gate) * up


__all__ = ["gelu_tanh", "silu", "geglu"]
