"""Manual double-buffered DMA for the w4 kernel: can we beat the automatic
grid pipeline's ~525 GB/s and approach the XLA dot's 722 GB/s?

Single kernel invocation; weights stay in HBM and are DMA'd block-by-block
into a 2-slot VMEM scratch with explicit semaphores (the guide's
double-buffering pattern), overlapping the bitcast-unpack + int8 dot of
block j with the DMA of block j+1.
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
BN = 1408
NB = NP // BN
L = 4


def _kernel(x_ref, p_hbm, s_ref, o_ref):
    def inner(scratch, sems):
        def get_dma(slot, j):
            return pltpu.make_async_copy(
                p_hbm.at[j], scratch.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def body(j, _):
            slot = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(j + 1 < NB)
            def _():
                get_dma(nxt, j + 1).start()

            get_dma(slot, j).wait()
            w = pltpu.bitcast(scratch[slot], jnp.int4).astype(jnp.int8)
            acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)
            o_ref[:, pl.ds(j * BN, BN)] = (
                acc.astype(jnp.float32) * s_ref[:, pl.ds(j * BN, BN)]
            )
            return ()

        jax.lax.fori_loop(0, NB, body, ())

    pl.run_scoped(
        inner,
        scratch=pltpu.VMEM((2, K // 2, BN), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def dbuf_w4(x, packed_bm, s):
    return pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, NP), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x, packed_bm, s)


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
    x = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
    w4 = jax.random.randint(key, (L, K, NP), -8, 8, jnp.int8)
    s = jnp.ones((L, 1, NP), jnp.float32)
    pk = ((w4[:, 0::2, :] & 0x0F) | ((w4[:, 1::2, :] & 0x0F) << 4)).astype(jnp.int8)
    pk_bm = jnp.stack([pk[:, :, i * BN : (i + 1) * BN] for i in range(NB)], axis=1)

    ref = (x.astype(jnp.int32) @ w4[0].astype(jnp.int32)).astype(jnp.float32)
    try:
        err = float(jnp.max(jnp.abs(ref - dbuf_w4(x, pk_bm[0], s[0]))))
        t, _, _ = timed_call(scanned(dbuf_w4, x), (pk_bm, s), warmup=2, iters=50)
        bw = K * NP // 2 / (t / L) / 1e9
        print(f"dbuf-w4: err={err:4.1f}  {t/L*1e6:7.1f} us/layer  "
              f"{bw:6.1f} GB/s packed", flush=True)
    except Exception as e:
        print(f"dbuf-w4 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
