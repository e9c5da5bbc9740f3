"""Round 6: DMA contiguity. The [K/2, BN]-of-[K/2, N] weight block is a
strided read (1408-byte bursts). Re-laying the packed weight block-major
([N/BN, K/2, BN]: one contiguous chunk per grid step) should lift the
stream rate toward the XLA dot's 722 GB/s.

Also measures M=96 (the pool64 short-pad prefill shape) for both layouts.
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
BN = 1408
NB = NP // BN
L = 4


def _kernel_rowmajor(x_ref, p_ref, s_ref, o_ref):
    w = pltpu.bitcast(p_ref[:], jnp.int4).astype(jnp.int8)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def _kernel_blockmajor(x_ref, p_ref, s_ref, o_ref):
    w = pltpu.bitcast(p_ref[0], jnp.int4).astype(jnp.int8)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * s_ref[:]


def make(m, layout):
    cost = pl.CostEstimate(
        flops=2 * m * K * NP,
        bytes_accessed=K * NP // 2 + m * K + m * NP * 4,
        transcendentals=0,
    )
    if layout == "row":
        spec_w = pl.BlockSpec((K // 2, BN), lambda j: (0, j), memory_space=pltpu.VMEM)
        kern = _kernel_rowmajor
    else:
        spec_w = pl.BlockSpec((1, K // 2, BN), lambda j: (j, 0, 0), memory_space=pltpu.VMEM)
        kern = _kernel_blockmajor

    def f(x, packed, s):
        return pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((m, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
                spec_w,
                pl.BlockSpec((1, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, BN), lambda j: (0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, NP), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=cost,
        )(x, packed, s)
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
    w4 = jax.random.randint(key, (L, K, NP), -8, 8, jnp.int8)
    s = jnp.ones((L, 1, NP), jnp.float32)
    pk = ((w4[:, 0::2, :] & 0x0F) | ((w4[:, 1::2, :] & 0x0F) << 4)).astype(jnp.int8)
    # block-major: [L, NB, K/2, BN]
    pk_bm = jnp.stack([pk[:, :, i * BN : (i + 1) * BN] for i in range(NB)], axis=1)

    for m in (8, 96):
        x = jax.random.randint(key, (m, K), -127, 128, jnp.int8)
        ref = (x.astype(jnp.int32) @ w4[0].astype(jnp.int32)).astype(jnp.float32)
        for layout, weights in (("row", pk), ("block", pk_bm)):
            fn = make(m, layout)
            err = float(jnp.max(jnp.abs(ref - fn(x, weights[0], s[0]))))
            t, _, _ = timed_call(scanned(fn, x), (weights, s), warmup=2, iters=50)
            bw = K * NP // 2 / (t / L) / 1e9
            print(f"m={m:3d} layout={layout:5s}: err={err:4.1f}  "
                  f"{t/L*1e6:7.1f} us/layer  {bw:6.1f} GB/s packed", flush=True)
        # xla int8 reference at this m
        def xla_fn(w, sc):
            acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * sc
        t, _, _ = timed_call(scanned(lambda xx, w, sc: xla_fn(w, sc), x),
                             (w4.astype(jnp.int8), s), warmup=2, iters=50)
        bw = K * NP / (t / L) / 1e9
        print(f"m={m:3d} xla-int8     :           {t/L*1e6:7.1f} us/layer  "
              f"{bw:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
