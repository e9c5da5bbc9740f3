"""Tuning pass for the pallas w4a8 kernel (see bench_pallas_int4.py).

First spike: pallas-int8 434 GB/s, pallas-w4 341 GB/s (packed) vs xla-int8
722 GB/s. Suspects: M=8 sub-tile x-blocks (int8 min tile (32,128)), small
block_n, int32-widened nibble ops. This sweeps those.
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

K, NP = 4096, 11264
L = 4


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def _w4_kernel(xlo_ref, xhi_ref, p_ref, s_ref, o_ref, *, native_i8):
    p = p_ref[:]
    if native_i8:
        lo = (((p & 0x0F) ^ 0x08) - 0x08).astype(jnp.int8)
        hi = (p >> 4).astype(jnp.int8)
    else:
        p32 = p.astype(jnp.int32)
        lo = (((p32 & 0x0F) ^ 0x08) - 0x08).astype(jnp.int8)
        hi = (p32 >> 4).astype(jnp.int8)
    acc = jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def make_int8(m, block_n):
    def f(x, w, s):
        return pl.pallas_call(
            _int8_kernel,
            grid=(NP // block_n,),
            in_specs=[
                pl.BlockSpec((m, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, NP), jnp.float32),
        )(x, w, s)
    return f


def make_w4(m, block_n, native_i8):
    kern = functools.partial(_w4_kernel, native_i8=native_i8)

    def f(x, packed, s):
        xlo, xhi = x[:, : K // 2], x[:, K // 2 :]
        return pl.pallas_call(
            kern,
            grid=(NP // block_n,),
            in_specs=[
                pl.BlockSpec((m, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, K // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K // 2, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, NP), jnp.float32),
        )(xlo, xhi, packed, s)
    return f


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
    w8 = jax.random.randint(key, (L, K, NP), -127, 127, jnp.int8)
    w4 = jnp.clip(w8, -8, 7).astype(jnp.int8)
    packed = ((w4[:, : K // 2, :] & 0x0F) | ((w4[:, K // 2 :, :] & 0x0F) << 4)).astype(jnp.int8)
    s = jnp.ones((L, 1, NP), jnp.float32)

    for m in (8, 32):
        x = jax.random.randint(key, (m, K), -127, 127, jnp.int8)
        for bn in (1024, 2816):
            fn = scanned(make_int8(m, bn), x)
            t, _, _ = timed_call(fn, (w8, s), warmup=2, iters=50)
            bw = K * NP / (t / L) / 1e9
            print(f"pallas-int8 m={m:2d} bn={bn}: {t/L*1e6:7.1f} us/layer  {bw:6.1f} GB/s", flush=True)
            for native in (False, True):
                fnw = scanned(make_w4(m, bn, native), x)
                try:
                    t, _, _ = timed_call(fnw, (packed, s), warmup=2, iters=50)
                    bw = K * NP // 2 / (t / L) / 1e9
                    print(f"pallas-w4  m={m:2d} bn={bn} native_i8={native}: "
                          f"{t/L*1e6:7.1f} us/layer  {bw:6.1f} GB/s packed", flush=True)
                except Exception as e:
                    print(f"pallas-w4  m={m:2d} bn={bn} native_i8={native}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
