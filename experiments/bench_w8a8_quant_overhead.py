"""Where does the W8A8 prefill's roofline gap go? (v5e, batch 1)

w8a8 prefill measures 5.55 ms vs ~2.8 ms weight / ~2.9 ms compute floors.
Per-matmul microbenchmarks at the production prefill shapes separate:
  (a) full w8a8_mm: dynamic activation quant (fp32 absmax/round) + int8 MXU
      dot + rescale
  (b) dot-only: pre-quantized int8 activations, int8 MXU dot + rescale
  (c) bf16 dot (the unquantized baseline)
If (a) - (b) is large, a fused Pallas quantize-matmul is the next kernel; if
(b) itself is far off the int8-MXU roofline, the win is elsewhere.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.ops.quant import quantize_weight_w8a8, w8a8_mm
from blurr_tpu.utils.monitor import timed_call

S = 280  # padded 277


from experiments.fastinit import iota_weights as mk


def bench(name, fn, *args, iters=50):
    t, _, _ = timed_call(jax.jit(fn), *args, warmup=3, iters=iters)
    print(f"{name:<46s} {t*1e6:9.1f} us", flush=True)
    return t


def main():
    shapes = [  # one layer's matmuls at prefill (vlm mixture)
        ("q [S,2048]x[2048,2048]", 2048, 2048),
        ("gate/up [S,2048]x[2048,16384]", 2048, 16384),
        ("down [S,16384]x[16384,2048]", 16384, 2048),
    ]
    total = {"w8a8": 0.0, "dot_only": 0.0, "bf16": 0.0}
    for name, k, n in shapes:
        x = mk((S, k), scale=1.0)
        w = mk((k, n))
        wq = quantize_weight_w8a8(w)

        t = bench(f"{name} w8a8 (quant+dot)", lambda x, wq: w8a8_mm(x, wq), x, wq)
        total["w8a8"] += t

        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.01), -128, 127).astype(jnp.int8)
        xs = jnp.full((S, 1), 0.01, jnp.float32)

        def dot_only(xq, wq, xs):
            acc = jax.lax.dot_general(
                xq, wq["q8a"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * xs * wq["s"]).astype(jnp.bfloat16)

        t = bench(f"{name} dot-only (pre-quant)", dot_only, xq, wq, xs)
        total["dot_only"] += t

        t = bench(f"{name} bf16", lambda x, w: x @ w, x, w)
        total["bf16"] += t
        print()

    f = 18  # layers
    print(f"per-layer x18: w8a8 {total['w8a8']*f*1e3:.2f} ms, "
          f"dot-only {total['dot_only']*f*1e3:.2f} ms, "
          f"bf16 {total['bf16']*f*1e3:.2f} ms")
    print(f"quant overhead at prefill: {(total['w8a8']-total['dot_only'])*f*1e3:.2f} ms "
          f"over 18 layers (gate+up counted once; up adds ~the same as gate)")


if __name__ == "__main__":
    main()
