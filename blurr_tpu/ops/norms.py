"""Normalization primitives with Gemma-exact numerics.

Semantics locked to the reference implementations:
- Gemma RMSNorm computes in float32 and scales by ``(1 + weight)`` BEFORE the
  downcast — ``(x * w).to(dtype)``, not ``x.to(dtype) * w``
  (reference src/model/paligemma/modules.py:7-21).
- AdaptiveRMSNorm / AdaptiveLayerscale implement adaLN / adaLN-Zero hooks of
  the action expert (reference src/model/vla/modules.py:78-119).

All functions are shape-polymorphic over leading dims and normalize the last
axis. They are plain functions over parameter pytrees — XLA fuses them into
the surrounding matmuls, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma RMSNorm: fp32 island, ``(1 + w)`` scaling, downcast at the end."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = normed * (1.0 + weight.astype(jnp.float32))
    return out.astype(dtype)


def _rms_only(x: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


def adaptive_rms_norm(
    x: jax.Array,
    cond: jax.Array,
    params: dict,
    eps: float = 1e-6,
) -> jax.Array:
    """adaLN: RMS-normalize then scale/shift from a conditioning vector.

    ``params`` holds ``to_gamma_w/b`` (followed by sigmoid) and ``to_beta_w``
    (no bias). ``cond`` is [B, Dc] or [B, 1, Dc].
    NOTE: matches the reference (src/model/vla/modules.py:88-99) in that the
    RMS itself runs in the input dtype (no fp32 upcast, unlike GemmaRMSNorm).
    """
    out = _rms_only(x, eps)
    if cond.ndim == 2:
        cond = cond[:, None, :]
    gamma = jax.nn.sigmoid(cond @ params["to_gamma_w"] + params["to_gamma_b"])
    beta = cond @ params["to_beta_w"]
    return out * gamma + beta


def adaptive_layerscale(x: jax.Array, cond: jax.Array, params: dict) -> jax.Array:
    """adaLN-Zero gated residual branch scale (sigmoid of a linear of cond)."""
    if cond.ndim == 2:
        cond = cond[:, None, :]
    gamma = cond @ params["gamma_w"] + params["gamma_b"]
    return x * jax.nn.sigmoid(gamma)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Standard LayerNorm (SigLIP towers), computed in float32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
