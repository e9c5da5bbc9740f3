"""Does a block-major Pallas int8 kernel beat the XLA int8 dot at the
Gemma-mixture prefill shapes the w8a8 presets use?

Context: in bench_pallas_int4_tune6.py the XLA int8 dot degraded to
130 GB/s at (M=96, K=4096, N=11264) while the pallas w4 kernel streamed
fine. This measures XLA vs a block-major pallas int8 kernel at:
  - pool64 prefill : M=96,  2048 -> 16384 (gate/up) and 16384 -> 2048 (down)
  - bridge prefill : M=276, same
  - decode         : M=5,   1024 -> 4096
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

L = 4


def _round_up(v, m):
    return -(-v // m) * m


def _kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[0], preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def pallas_int8_bm(m, k, n, bn):
    nb = n // bn

    def f(x, w_bm, s):
        cost = pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k + m * n * 4,
            transcendentals=0,
        )
        bm_rows = _round_up(m, 8)
        if bm_rows != m:
            x = jnp.pad(x, ((0, bm_rows - m), (0, 0)))
        out = pl.pallas_call(
            _kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((bm_rows, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, bn), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm_rows, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm_rows, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=cost,
        )(x, w_bm, s)
        return out[:m]
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
    for name, (m, k, n) in {
        "pool64 gate/up (96, 2048->16384)": (96, 2048, 16384),
        "pool64 down (96, 16384->2048)": (96, 16384, 2048),
        "bridge gate/up (276, 2048->16384)": (276, 2048, 16384),
        "decode (5, 1024->4096)": (5, 1024, 4096),
    }.items():
        x = jax.random.randint(key, (m, k), -127, 128, jnp.int8)
        w = jax.random.randint(key, (L, k, n), -127, 128, jnp.int8)
        s = jnp.ones((L, 1, n), jnp.float32)

        def xla_fn(w1, sc):
            acc = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * sc
        t, _, _ = timed_call(scanned(lambda xx, w1, sc: xla_fn(w1, sc), x),
                             (w, s), warmup=2, iters=30)
        bw = k * n / (t / L) / 1e9
        print(f"{name:36s} xla-int8 : {t/L*1e6:8.1f} us/layer  {bw:6.1f} GB/s", flush=True)

        bn = 2048 if n % 2048 == 0 else 1024
        nb = n // bn
        w_bm = jnp.moveaxis(w.reshape(L, k, nb, bn), 2, 1)  # [L, nb, k, bn]
        fn = pallas_int8_bm(m, k, n, bn)
        err = float(jnp.max(jnp.abs(xla_fn(w[0], s[0]) - fn(x, w_bm[0], s[0]))))
        t, _, _ = timed_call(scanned(fn, x), (w_bm, s), warmup=2, iters=30)
        bw = k * n / (t / L) / 1e9
        print(f"{name:36s} pallas-bm: {t/L*1e6:8.1f} us/layer  {bw:6.1f} GB/s  err={err}", flush=True)


if __name__ == "__main__":
    main()
