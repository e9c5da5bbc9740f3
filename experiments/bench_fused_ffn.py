"""Fused GeGLU-FFN Pallas kernel experiment (v5e, prefill shapes).

XLA's 3-matmul FFN materializes the [S, 16384] gate and up outputs through
HBM (~36 MB write+read per layer at S=280 → ~0.65 GB over 18 layers). This
kernel keeps the intermediate in VMEM: grid over I-blocks, compute
gate/up block dots, GeGLU on-chip, and accumulate the down partial products
into an [S, H] fp32 scratch. Round-1's "fused gate+up projection" dead end
only merged the two projections (same HBM intermediates); this is the full
fusion.

Measures kernel vs XLA at the production layer shape and as an 18x loop.
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blurr_tpu.utils.monitor import timed_call

M, K, I = 280, 2048, 16384  # padded S=277, Gemma hidden/intermediate


def _kernel(x_ref, gw_ref, uw_ref, dw_ref, o_ref, acc_ref, *, n_steps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [M, K] bf16 (resident)
    g = jnp.dot(x, gw_ref[:], preferred_element_type=jnp.float32)  # [M, BI]
    u = jnp.dot(x, uw_ref[:], preferred_element_type=jnp.float32)
    a = jax.nn.gelu(g, approximate=True) * u
    acc_ref[:] += jnp.dot(
        a.astype(jnp.bfloat16), dw_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(i == n_steps - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_i",))
def fused_ffn(x, gate_w, up_w, down_w, block_i: int = 512):
    m, k = x.shape
    _, inter = gate_w.shape
    n_steps = inter // block_i
    return pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, block_i), lambda i: (0, i)),
            pl.BlockSpec((k, block_i), lambda i: (0, i)),
            pl.BlockSpec((block_i, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m, k), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, k), jnp.float32)],
    )(x, gate_w, up_w, down_w)


def xla_ffn(x, gate_w, up_w, down_w):
    g = x @ gate_w
    u = x @ up_w
    return (jax.nn.gelu(g, approximate=True) * u) @ down_w


from experiments.fastinit import iota_weights as mk


def main():
    x = mk((M, K), scale=1.0)
    gw, uw, dw = mk((K, I)), mk((K, I)), mk((I, K))

    ref = jax.jit(xla_ffn)(x, gw, uw, dw)
    for bi in (128, 256, 384):
        out = fused_ffn(x, gw, uw, dw, block_i=bi)
        dev = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        t, _, _ = timed_call(
            functools.partial(fused_ffn, block_i=bi), x, gw, uw, dw,
            warmup=3, iters=30,
        )
        print(f"fused bi={bi}: {t*1e6:8.1f} us  (maxdev vs xla {dev:.3e})", flush=True)

    t, _, _ = timed_call(jax.jit(xla_ffn), x, gw, uw, dw, warmup=3, iters=30)
    print(f"xla 3-matmul:  {t*1e6:8.1f} us", flush=True)

    # 18-layer scan context (how it would run inside prefill)
    gws = jnp.stack([gw] * 18)
    uws = jnp.stack([uw] * 18)
    dws = jnp.stack([dw] * 18)

    def scan_xla(x, gws, uws, dws):
        def body(h, ws):
            g, u, d = ws
            return xla_ffn(h, g, u, d), None
        h, _ = jax.lax.scan(body, x, (gws, uws, dws))
        return h

    def scan_fused(x, gws, uws, dws):
        def body(h, ws):
            g, u, d = ws
            return fused_ffn(h, g, u, d, block_i=256), None
        h, _ = jax.lax.scan(body, x, (gws, uws, dws))
        return h

    t, _, _ = timed_call(jax.jit(scan_xla), x, gws, uws, dws, warmup=2, iters=10)
    print(f"scan18 xla:    {t*1e3:8.3f} ms", flush=True)
    t, _, _ = timed_call(jax.jit(scan_fused), x, gws, uws, dws, warmup=2, iters=10)
    print(f"scan18 fused:  {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
