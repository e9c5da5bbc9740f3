"""Pallas fused dequant-matmul: y = x @ (w_int8 * scale).

XLA materializes the dequantized bf16 weight through HBM (measured: the
weight-only int8 path is SLOWER than plain bf16), defeating the point of
int8 storage. This kernel streams the int8 weight HBM->VMEM (half the
bytes), dequantizes in VMEM, and feeds the MXU.

Measured (v5e, action-expert decode shapes): ~25% faster than the
XLA-dequant lowering, but plain bf16 weights remain faster still at these
sizes — use the W8A8 path (ops.quant.w8a8_mm) when quantized speed is the
goal; weight-only int8 is a storage/accuracy option, not a TPU fast path.

Shapes: x [M, K] (fp), w {q: int8 [K, N], s: fp32 [N]}; grid over (M, N)
blocks with K resident (K <= ~16k fits VMEM budgets at these block sizes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from blurr_tpu.ops.pallas_common import round_up as _round_up
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, s_ref, o_ref, *, out_dtype):
    x = x_ref[:]  # [BM, K]
    w = wq_ref[:]  # [K, BN] int8
    s = s_ref[:]  # [1, BN] fp32
    wf = w.astype(jnp.bfloat16)
    acc = jnp.dot(x.astype(jnp.bfloat16), wf, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s).astype(out_dtype)



@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul(
    x: jax.Array,  # [M, K] fp
    wq: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [N] fp32
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (k, k2)
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    m_p, n_p = _round_up(m, bm), _round_up(n, bn)
    k_p = _round_up(k, 128)

    xp = jnp.pad(x, ((0, m_p - m), (0, k_p - k)))
    wp = jnp.pad(wq, ((0, k_p - k), (0, n_p - n)))
    sp = jnp.pad(scale.astype(jnp.float32), (0, n_p - n)).reshape(1, n_p)

    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=x.dtype),
        grid=(m_p // bm, n_p // bn),
        in_specs=[
            pl.BlockSpec((bm, k_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_p, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), x.dtype),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:m, :n]


def int8_mm_nd(x: jax.Array, w: dict, interpret: bool = False) -> jax.Array:
    """mm()-compatible wrapper: x [..., K] @ {q [K,N], s [N]} -> [..., N]."""
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    y = int8_matmul(x.reshape(m, x.shape[-1]), w["q"], w["s"], interpret=interpret)
    return y.reshape(*lead, y.shape[-1])
