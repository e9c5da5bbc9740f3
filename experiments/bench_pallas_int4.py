"""Pallas w4a8 feasibility: can a fused unpack-matmul reach int4 bandwidth?

Target shape: OpenVLA-7B Llama decode GEMV-ish (M=8 padded, K=4096,
N=11008) — the bandwidth-bound case where int4 weights could halve the
87 ms w8a8 decode floor.

Packing trick: nibble-pack rows k and k+K/2 of the int4 weight into one
int8 byte. The kernel then unpacks into two CONTIGUOUS [K/2, BN] int8
halves (2 elementwise ops each, no interleave/relayout) and computes
   y = x[:, :K/2] @ lo + x[:, K/2:] @ hi
as two MXU int8 dots sharing the same per-column scale.

Compares:
  xla-int8   : jax.lax.dot_general int8 (the w8a8 production path)
  pallas-int8: same bytes via a pallas kernel (kernel overhead reference)
  pallas-w4  : packed int4, fused unpack + 2 dots
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

M, K, N = 8, 4096, 11008
NP = 11264  # N padded to 512
L = 4       # scan a few layers so DMA pipelining shows


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def _w4_kernel(xlo_ref, xhi_ref, p_ref, s_ref, o_ref):
    p = p_ref[:].astype(jnp.int32)          # [K/2, BN]
    lo = (((p & 0x0F) ^ 0x08) - 0x08).astype(jnp.int8)
    hi = ((p >> 4)).astype(jnp.int8)        # arithmetic: sign-extended
    acc = jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def pallas_int8(x, w, s, block_n=512):
    return pl.pallas_call(
        _int8_kernel,
        grid=(NP // block_n,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NP), jnp.float32),
    )(x, w, s)


def pallas_w4(x, packed, s, block_n=512):
    xlo, xhi = x[:, : K // 2], x[:, K // 2 :]
    return pl.pallas_call(
        _w4_kernel,
        grid=(NP // block_n,),
        in_specs=[
            pl.BlockSpec((M, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NP), jnp.float32),
    )(xlo, xhi, packed, s)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (L, K, NP), -127, 127, jnp.int8)
    # int4 values packed: byte[k, n] = lo=row k | hi=row k+K/2
    w4 = jnp.clip(w8, -8, 7).astype(jnp.int8)
    packed = ((w4[:, : K // 2, :] & 0x0F) | ((w4[:, K // 2 :, :] & 0x0F) << 4)).astype(jnp.int8)
    s = jnp.ones((L, 1, NP), jnp.float32)

    # correctness (single layer)
    ref = (
        x.astype(jnp.int32) @ w4[0].astype(jnp.int32)
    ).astype(jnp.float32)
    got = pallas_w4(x, packed[0], s[0])
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"w4 kernel max err vs int32 reference: {err}", flush=True)

    def scan_over(fn, w_leaves):
        def body(c, wl):
            y = fn(*wl)
            return c + y[:, :8].astype(jnp.float32).sum(), None

        def outer(x0, leaves):
            out, _ = jax.lax.scan(lambda c, wl: body(c, wl), 0.0, leaves)
            return out
        return outer

    variants = {
        "xla-int8": (jax.jit(scan_over(
            lambda w, sc: (jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                               preferred_element_type=jnp.int32)
                           .astype(jnp.float32) * sc), None)), (w8, s)),
        "pallas-int8": (jax.jit(scan_over(lambda w, sc: pallas_int8(x, w, sc), None)), (w8, s)),
        "pallas-w4": (jax.jit(scan_over(lambda p, sc: pallas_w4(x, p, sc), None)), (packed, s)),
    }
    bytes_per = {"xla-int8": K * NP, "pallas-int8": K * NP, "pallas-w4": K * NP // 2}
    for name, (fn, leaves) in variants.items():
        t, _, _ = timed_call(fn, x, leaves, warmup=2, iters=50)
        per_layer = t / L
        bw = bytes_per[name] / per_layer / 1e9
        print(f"{name:12s}: {per_layer*1e6:8.1f} us/layer  eff-BW {bw:6.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
