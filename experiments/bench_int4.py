"""Is INT4 weight storage a win over W8A8 on v5e at Pi-0 shapes?

Measures an 18-layer scanned Gemma-MLP chain (gate/up/down dominate weight
bytes) at the two shapes that matter for the blurr preset:
  - prefill: S=276 tokens, 2048/16384 (VLM mixture)
  - decode : S=5 tokens, 1024/4096  (action expert, 1 flow step)

Variants:
  bf16   : bf16 weights, bf16 MXU
  w8a8   : int8 weights + dynamic per-token int8 activations, int8 MXU
  w4a8   : nibble-packed int4 weights (int8 container, 0.5 B/weight in HBM),
           unpacked to int8 in-graph, int8 MXU
  w4a16  : nibble-packed int4 weights dequantized to bf16, bf16 MXU

NOTE: jnp.int4 (S4) arrays cannot cross a jit boundary on this backend —
device_put relayout of S4 recurses (RecursionError: "Recursively calling
jit"). Packing two nibbles per int8 sidesteps that and is layout-portable.

The question XLA answers here: does the unpack (shift/mask + interleave)
fuse into the dot operand read, or does it materialize the unpacked int8 in
HBM (in which case only a Pallas kernel gets the bandwidth win)?
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from blurr_tpu.utils.monitor import timed_call

L = 18


def pack_int4_rows(q):
    """int8 [..., K, N] with values in [-8, 7] -> packed int8 [..., K//2, N].

    Row 2i goes to the low nibble, row 2i+1 to the high nibble.
    """
    lo = q[..., 0::2, :] & 0x0F
    hi = (q[..., 1::2, :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_rows(p):
    """packed int8 [..., K//2, N] -> int8 [..., K, N] (sign-extended)."""
    lo = ((p & 0x0F) ^ 0x08) - 0x08          # sign-extend low nibble
    hi = jnp.right_shift(p, 4)                # arithmetic shift on int8
    stacked = jnp.stack([lo, hi], axis=-2)    # [..., K//2, 2, N]
    shape = p.shape[:-2] + (p.shape[-2] * 2, p.shape[-1])
    return stacked.reshape(shape).astype(jnp.int8)


def make_weights(key, hidden, inter, variant):
    ks = jax.random.split(key, 3)
    shapes = [(L, hidden, inter), (L, hidden, inter), (L, inter, hidden)]
    ws = []
    for k, shp in zip(ks, shapes):
        w = (jax.random.normal(k, shp, jnp.bfloat16) * 0.02).astype(jnp.bfloat16)
        if variant == "bf16":
            ws.append({"w": w})
            continue
        wf = w.astype(jnp.float32)
        if variant == "w8a8":
            s = jnp.clip(jnp.max(jnp.abs(wf), axis=-2), 1e-6) / 127.0
            q = jnp.clip(jnp.round(wf / s[:, None, :]), -128, 127).astype(jnp.int8)
        else:  # w4a8 / w4a16: per-out-channel int4, nibble-packed over rows
            s = jnp.clip(jnp.max(jnp.abs(wf), axis=-2), 1e-6) / 7.0
            q4 = jnp.clip(jnp.round(wf / s[:, None, :]), -8, 7).astype(jnp.int8)
            q = pack_int4_rows(q4)
        ws.append({"q": q, "s": s.astype(jnp.float32)})
    return {"gate": ws[0], "up": ws[1], "down": ws[2]}


def mlp_chain(variant):
    def one(x, w):
        if variant == "bf16":
            return x @ w["w"]
        if variant == "w4a16":
            deq = unpack_int4_rows(w["q"]).astype(x.dtype) * w["s"].astype(x.dtype)[None, :]
            return x @ deq
        # int8-MXU paths: dynamic per-token activation quant
        xf = x.astype(jnp.float32)
        xs = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -128, 127).astype(jnp.int8)
        wq = unpack_int4_rows(w["q"]) if variant == "w4a8" else w["q"]
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * xs * w["s"]).astype(x.dtype)

    def step(x, layer):
        g = one(x, layer["gate"])
        u = one(x, layer["up"])
        h = jax.nn.gelu(g) * u
        y = one(h, layer["down"])
        return x + y.astype(x.dtype), None

    def chain(x, weights):
        out, _ = jax.lax.scan(step, x, weights)
        return out

    return chain


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)
    for name, (S, hidden, inter) in {
        "prefill(S=276,2048/16384)": (276, 2048, 16384),
        "decode(S=5,1024/4096)": (5, 1024, 4096),
    }.items():
        x = jax.random.normal(jax.random.PRNGKey(0), (S, hidden), jnp.bfloat16)
        bytes_bf16 = L * 3 * hidden * inter * 2 / 1e9
        print(f"-- {name}: bf16 weight bytes {bytes_bf16:.2f} GB", flush=True)
        for variant in ("bf16", "w8a8", "w4a8", "w4a16"):
            weights = make_weights(jax.random.PRNGKey(1), hidden, inter, variant)
            fn = jax.jit(mlp_chain(variant))
            t, _, _ = timed_call(fn, x, weights, warmup=2, iters=20)
            print(f"{variant:6s}: {t*1e3:8.3f} ms", flush=True)
            del weights, fn


if __name__ == "__main__":
    main()
