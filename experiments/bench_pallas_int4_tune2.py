"""Round 2 of the w4a8 unpack tuning: the kernel is VPU-unpack-bound
(327 GB/s packed vs 28 us DMA floor). Three cheaper unpack strategies:

  shift2  : sign-extend via (p<<28)>>28 / p>>4 on int32 (fewer ops than &/^/-)
  bitcast : pltpu.bitcast the packed int8 block to jnp.int4 and astype(int8)
            — if Mosaic lowers s4->s8 natively, the unpack is ~free
  biased  : store nibbles biased by +8 (unsigned); dot with (b&15) and
            (b>>4 as unsigned) then subtract an 8*rowsum(x) bias — one mask +
            one shift, no sign-extension chain

All compared at m=8, bn=1024 on the OpenVLA decode GEMV shape.
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blurr_tpu.utils.monitor import timed_call

M, K, NP = 8, 4096, 11264
BN = 1024
L = 4


def _w4_shift2(xlo_ref, xhi_ref, p_ref, s_ref, o_ref):
    p32 = p_ref[:].astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    acc = jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def _w4_bitcast(xfull_ref, p_ref, s_ref, o_ref):
    # packed int8 [K/2, BN] reinterpreted as int4 [K, BN]; nibble order is
    # whatever the hardware lane order gives — the packing below must match.
    w4 = pltpu.bitcast(p_ref[:], jnp.int4)
    w = w4.astype(jnp.int8)
    acc = jnp.dot(xfull_ref[:], w, preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def _w4_biased(xlo_ref, xhi_ref, xsum_ref, p_ref, s_ref, o_ref):
    p32 = p_ref[:].astype(jnp.int32)
    lo = (p32 & 0x0F).astype(jnp.int8)           # unsigned biased nibble
    hi = ((p32 >> 4) & 0x0F).astype(jnp.int8)
    acc = jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.int32)
    # subtract the +8 bias: sum_k (x_lo + x_hi) * 8, precomputed per row
    o_ref[:] = (acc - xsum_ref[:]).astype(jnp.float32) * s_ref[:]


def run_shift2(x, packed, s):
    xlo, xhi = x[:, : K // 2], x[:, K // 2 :]
    return pl.pallas_call(
        _w4_shift2,
        grid=(NP // BN,),
        in_specs=[
            pl.BlockSpec((M, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NP), jnp.float32),
    )(xlo, xhi, packed, s)


def run_bitcast(x, packed, s):
    return pl.pallas_call(
        _w4_bitcast,
        grid=(NP // BN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NP), jnp.float32),
    )(x, packed, s)


def run_biased(x, packed, s):
    xlo, xhi = x[:, : K // 2], x[:, K // 2 :]
    xsum = (8 * (xlo.astype(jnp.int32).sum(-1) + xhi.astype(jnp.int32).sum(-1)))
    xsum = xsum.reshape(M, 1).astype(jnp.int32)
    return pl.pallas_call(
        _w4_biased,
        grid=(NP // BN,),
        in_specs=[
            pl.BlockSpec((M, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NP), jnp.float32),
    )(xlo, xhi, xsum, packed, s)


def scanned(fn, x):
    def outer(leaves):
        def body(c, wl):
            y = fn(x, *wl)
            return c + y[:, :8].astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, 0.0, leaves)
        return out
    return jax.jit(outer)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    w4 = jax.random.randint(key, (L, K, NP), -8, 8, jnp.int8)
    s = jnp.ones((L, 1, NP), jnp.float32)
    ref = (x.astype(jnp.int32) @ w4[0].astype(jnp.int32)).astype(jnp.float32)

    # row-pair packing (rows k / k+K/2) for shift2
    pk_rows = ((w4[:, : K // 2, :] & 0x0F) | ((w4[:, K // 2 :, :] & 0x0F) << 4)).astype(jnp.int8)
    # biased packing: nibbles are (q+8) unsigned
    w4b = (w4 + 8).astype(jnp.int8)
    pk_bias = ((w4b[:, : K // 2, :] & 0x0F) | ((w4b[:, K // 2 :, :] & 0x0F) << 4)).astype(jnp.int8)
    # bitcast packing guess A: adjacent-row pairs, low nibble = even row
    pk_adj = ((w4[:, 0::2, :] & 0x0F) | ((w4[:, 1::2, :] & 0x0F) << 4)).astype(jnp.int8)

    for name, fn, pk in (
        ("shift2", run_shift2, pk_rows),
        ("biased", run_biased, pk_bias),
        ("bitcast", run_bitcast, pk_adj),
    ):
        try:
            got = fn(x, pk[0], s[0])
            err = float(jnp.max(jnp.abs(ref - got)))
            tfn = scanned(fn, x)
            t, _, _ = timed_call(tfn, (pk, s), warmup=2, iters=50)
            bw = K * NP // 2 / (t / L) / 1e9
            print(f"{name:8s}: err={err:8.1f}  {t/L*1e6:7.1f} us/layer  "
                  f"{bw:6.1f} GB/s packed", flush=True)
        except Exception as e:
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
