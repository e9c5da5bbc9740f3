"""GPTQ: calibration-based error-feedback rounding for the w4a8 tier.

The data-free MSE-clip search (ops/quant.py:quantize_weight_w4a8) minimizes
per-cell WEIGHT reconstruction error. GPTQ (Frantar et al., 2022) minimizes
the LAYER OUTPUT error ||X(W - Wq)||^2 for a calibration activation matrix
X: rows of W are quantized sequentially and each row's rounding error is
propagated into the not-yet-quantized rows through the inverse Hessian
H^-1 = (X^T X + damp I)^-1, so later rows compensate earlier rows' errors
in directions the data actually exercises.

TPU-native formulation: weights are [K, N] (in, out — the repo layout), so
GPTQ walks ROWS (input dims). The inner sequential walk is a
``lax.fori_loop`` over one scale-group's rows operating on a [gs, N]
buffer (MXU-friendly rank-2 updates), and cross-group error propagation is
one [rest, gs] x [gs, N] matmul per group — the standard blocked GPTQ
schedule with block = scale group. Output format is byte-identical to
quantize_weight_w4a8 ({"q4" block-major packed int4, "s" [G, N] group
scales}), so the Pallas kernel, the serving path, and the TP repack all
consume GPTQ weights unchanged.

With H = I the algorithm degenerates EXACTLY to the data-free RTN + MSE
clip path (no propagation, same scale search) — asserted in
tests/test_gptq.py.

reference third_party has no GPTQ; this implements the public algorithm
(arXiv:2210.17323) against the reference's int8-recipe role
(config/eval/bridge_pool64_steps2.yaml:19-27) as the w4a8 accuracy upgrade
(round-4 verdict Next #4).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from blurr_tpu.ops.quant import _W4A8_CLIP_GRID


def hessian_from_inputs(x: jax.Array, damp: float = 0.01) -> jax.Array:
    """X [T, K] (zero rows for padded/invalid tokens are harmless — they
    contribute nothing) -> damped fp32 Hessian 2X^T X / T + damp*mean(diag)*I.
    Dead inputs (zero diagonal) get a unit diagonal so the Cholesky stays
    positive-definite; their weight rows then quantize without feedback."""
    xf = x.astype(jnp.float32)
    h = (2.0 / max(x.shape[0], 1)) * (xf.T @ xf)
    diag = jnp.diagonal(h)
    dead = diag == 0.0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    mean_diag = jnp.mean(jnp.where(dead, 0.0, diag))
    return h + damp * jnp.clip(mean_diag, 1e-8) * jnp.eye(h.shape[0], dtype=jnp.float32)


def _mse_group_scale(wg: jax.Array, grid=_W4A8_CLIP_GRID) -> jax.Array:
    """Per-out-channel int4 scale for one group's CURRENT (error-
    compensated) rows [gs, N] via the same clip-grid MSE search as the
    data-free path (ops/quant.py)."""
    amax = jnp.clip(jnp.max(jnp.abs(wg), axis=0), 1e-6)  # [N]
    scale = amax / 7.0
    q = jnp.clip(jnp.round(wg / scale), -8, 7)
    best = jnp.sum((q * scale - wg) ** 2, axis=0)
    for c in grid[1:]:
        s_c = amax * (c / 7.0)
        q_c = jnp.clip(jnp.round(wg / s_c), -8, 7)
        e_c = jnp.sum((q_c * s_c - wg) ** 2, axis=0)
        take = e_c < best
        best = jnp.where(take, e_c, best)
        scale = jnp.where(take, s_c, scale)
    return scale  # [N]


def _quantize_group(wg: jax.Array, u_gg: jax.Array):
    """Sequential error-feedback walk over one group's rows.

    wg: [gs, N] current (compensated) rows; u_gg: [gs, gs] the group's
    diagonal block of the upper-Cholesky factor of H^-1. Returns
    (q [gs, N] int levels, scale [N], err [gs, N]) where err rows are the
    normalized residuals later rows / groups subtract via U."""
    gs = wg.shape[0]
    scale = _mse_group_scale(wg)
    rows = jnp.arange(gs)

    def row_step(i, carry):
        w, q, err = carry
        w_i = jax.lax.dynamic_index_in_dim(w, i, keepdims=False)  # [N]
        q_i = jnp.clip(jnp.round(w_i / scale), -8, 7)
        e_i = (w_i - q_i * scale) / jax.lax.dynamic_index_in_dim(
            jnp.diagonal(u_gg), i, keepdims=False
        )
        # propagate into not-yet-quantized rows of THIS group
        u_row = jax.lax.dynamic_index_in_dim(u_gg, i, keepdims=False)  # [gs]
        upd = jnp.where((rows > i)[:, None], u_row[:, None] * e_i[None, :], 0.0)
        w = w - upd
        q = jax.lax.dynamic_update_index_in_dim(q, q_i, i, 0)
        err = jax.lax.dynamic_update_index_in_dim(err, e_i, i, 0)
        return w, q, err

    init = (wg, jnp.zeros_like(wg), jnp.zeros_like(wg))
    _, q, err = jax.lax.fori_loop(0, gs, row_step, init)
    return q, scale, err


@functools.partial(jax.jit, static_argnames=("group_size",))
def _gptq_levels(w: jax.Array, hessian: jax.Array, group_size: int):
    """[K, N] fp weight + [K, K] Hessian -> (int levels [K, N], scales
    [G, N]). The blocked GPTQ schedule: groups processed in order, each
    group's rows walked sequentially with in-group feedback, then one
    matmul propagates the group's residual into all remaining rows."""
    k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    n_groups = k // group_size

    # upper Cholesky factor U of H^-1 (H^-1 = U^T U): torch-GPTQ's
    # cholesky(cholesky_inverse(cholesky(H)), upper=True). The inverse goes
    # through cho_solve (not generic inv) and gets symmetrized + jittered —
    # in fp32 an ill-conditioned H's inverse drifts off PSD and LAPACK
    # potrf then emits NaNs (observed on the CPU backend), which would
    # silently poison every propagated row.
    eye = jnp.eye(k, dtype=jnp.float32)
    cf = jax.scipy.linalg.cho_factor(hessian.astype(jnp.float32))
    hinv = jax.scipy.linalg.cho_solve(cf, eye)
    hinv = 0.5 * (hinv + hinv.T)
    hinv = hinv + 1e-5 * jnp.mean(jnp.diagonal(hinv)) * eye
    u = jax.scipy.linalg.cholesky(hinv, lower=False)  # [K, K] upper
    # terminal fallback for pathological conditioning: no feedback (U
    # diagonal — degenerates to RTN) beats NaN weights
    u_diag = jnp.diag(jnp.sqrt(jnp.clip(jnp.diagonal(hinv), 1e-12)))
    u = jnp.where(jnp.isnan(u).any(), u_diag, u)

    wf = w.astype(jnp.float32)
    q_parts, s_parts = [], []
    for g in range(n_groups):
        g0 = g * group_size
        wg = jax.lax.dynamic_slice(wf, (g0, 0), (group_size, n))
        u_gg = jax.lax.dynamic_slice(u, (g0, g0), (group_size, group_size))
        q_g, s_g, err = _quantize_group(wg, u_gg)
        q_parts.append(q_g)
        s_parts.append(s_g)
        rest = k - g0 - group_size
        if rest > 0:
            u_gr = jax.lax.dynamic_slice(u, (g0, g0 + group_size),
                                         (group_size, rest))
            upd = jnp.einsum("gr,gn->rn", u_gr, err)
            wf = jax.lax.dynamic_update_slice(
                wf,
                jax.lax.dynamic_slice(wf, (g0 + group_size, 0), (rest, n)) - upd,
                (g0 + group_size, 0),
            )
    return jnp.concatenate(q_parts, 0), jnp.stack(s_parts, 0)


def gptq_quantize_weight(
    w: jax.Array,
    hessian: jax.Array,
    group_size: int = 512,
    shards: int = 1,
) -> dict:
    """[K, N] + calibration Hessian [K, K] -> w4a8 dict {"q4", "s"}, the
    same format (block-major int4 packing, [G, N] fp32 group scales) as
    the data-free quantize_weight_w4a8 — drop-in for mm()/the Pallas
    kernel/TP repack."""
    from blurr_tpu.ops.pallas_int4_matmul import (
        pack_int4,
        pick_block_layout,
        pick_group_size,
        to_block_major,
    )

    assert w.ndim == 2 and w.shape[0] % 2 == 0, w.shape
    k, n = w.shape
    gs = pick_group_size(k, group_size)
    q, scale = _gptq_levels(w, hessian, gs)
    q = q.astype(jnp.int8)
    bn, n_pad = pick_block_layout(n, shards)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
    return {"q4": to_block_major(pack_int4(q), bn),
            "s": scale.astype(jnp.float32)}


def layer_output_mse(x: jax.Array, w: jax.Array, wq: dict) -> jax.Array:
    """||X W - X deq(Wq)||^2 / T — the quantity GPTQ minimizes; used by the
    experiments to score GPTQ vs data-free rounding on held-out
    activations."""
    from blurr_tpu.ops.quant import _w4a8_deq

    deq = _w4a8_deq(wq["q4"], wq["s"], w.shape[0])
    xf = x.astype(jnp.float32)
    d = xf @ (w.astype(jnp.float32) - deq)
    return jnp.sum(d * d) / max(x.shape[0], 1)
