"""Bisect the vlm-only prefill slowdown: toggle features of the real code path."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import grouped_attention
from blurr_tpu.ops.norms import rms_norm
from blurr_tpu.ops.rotary import apply_rope, rope_cos_sin
from blurr_tpu.utils.monitor import timed_call

L, S, H, I, NH, KVH, D = 18, 276, 2048, 16384, 8, 1, 256


def mk(shape, dtype=jnp.bfloat16, scale=0.02):
    n = int(np.prod(shape))
    return ((jnp.arange(n, dtype=jnp.float32) % 101 - 50) * (scale / 50)).reshape(shape).astype(dtype)


def split_heads(x, n):
    b, s, _ = x.shape
    return x.reshape(b, s, n, D).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, n, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, n * d)


def make_fn(emit_kv=True, rope=True, softclamp=50.0, fp32_norm=True, scale_in=True):
    def norm(x, w):
        if fp32_norm:
            return rms_norm(x, w)
        return x * (1.0 + w)

    def run(params, x, mask, pos):
        if scale_in:
            x = x * jnp.asarray(H**0.5, x.dtype)
        cos, sin = rope_cos_sin(pos, D)

        def body(h, lp):
            xx = norm(h, lp["in_n"])
            q = split_heads(xx @ lp["q_w"], NH)
            k = split_heads(xx @ lp["k_w"], KVH)
            v = split_heads(xx @ lp["v_w"], KVH)
            if rope:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            a = merge_heads(grouped_attention(q, k, v, mask, softclamp))
            h = h + a @ lp["o_w"]
            xx = norm(h, lp["post_n"])
            h = h + (jax.nn.gelu(xx @ lp["gate_w"], approximate=True) * (xx @ lp["up_w"])) @ lp["down_w"]
            return h, (k, v) if emit_kv else None

        h, ys = jax.lax.scan(body, x, params)
        return h, ys

    return jax.jit(run)


def main():
    params = {
        "q_w": mk((L, H, NH * D)),
        "k_w": mk((L, H, KVH * D)),
        "v_w": mk((L, H, KVH * D)),
        "o_w": mk((L, NH * D, H)),
        "gate_w": mk((L, H, I)),
        "up_w": mk((L, H, I)),
        "down_w": mk((L, I, H)),
        "in_n": mk((L, H), scale=0.001),
        "post_n": mk((L, H), scale=0.001),
    }
    x = mk((1, S, H), scale=1.0)
    mask = jnp.ones((1, S, S), bool)
    pos = jnp.broadcast_to(jnp.arange(1, S + 1, dtype=jnp.int32)[None], (1, S))

    variants = [
        ("full(real-path)", make_fn()),
        ("no-kv-emit", make_fn(emit_kv=False)),
        ("no-rope", make_fn(rope=False)),
        ("no-clamp", make_fn(softclamp=None)),
        ("cheap-norm", make_fn(fp32_norm=False)),
        ("no-kv+no-rope", make_fn(emit_kv=False, rope=False)),
    ]
    for name, f in variants:
        t, _, _ = timed_call(f, params, x, mask, pos, warmup=2, iters=10)
        print(f"{name}: {t*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
