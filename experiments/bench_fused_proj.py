"""Does fusing QKV (one [H,(NH+2KVH)D] dot) or gate+up (one [H,2I] dot)
speed up the 18-layer Gemma-mixture prefill at S=276 on v5e?

Hypothesis: prefill is near the weight-bandwidth/compute roofline already
(8.7 ms vs ~6.8 floor, docs/ARCHITECTURE.md); fusing doesn't change bytes or
FLOPs, but fewer/larger dots can pipeline better and cut per-op overhead.
"""

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
    return ((jnp.arange(n, dtype=jnp.float32) % 101 - 50) * (scale / 50)).reshape(
        shape
    ).astype(dtype)


def split_heads(x, n):
    b, s, _ = x.shape
    return x.reshape(b, s, n, D).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, n, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, n * d)


def make_params(fuse_qkv, fuse_gateup):
    lp = {
        "in_n": mk((L, H)),
        "post_n": mk((L, H)),
        "o_w": mk((L, NH * D, H)),
        "down_w": mk((L, I, H)),
    }
    if fuse_qkv:
        lp["qkv_w"] = mk((L, H, (NH + 2 * KVH) * D))
    else:
        lp["q_w"] = mk((L, H, NH * D))
        lp["k_w"] = mk((L, H, KVH * D))
        lp["v_w"] = mk((L, H, KVH * D))
    if fuse_gateup:
        lp["gu_w"] = mk((L, H, 2 * I))
    else:
        lp["gate_w"] = mk((L, H, I))
        lp["up_w"] = mk((L, H, I))
    return lp


def make_fn(fuse_qkv, fuse_gateup):
    def run(params, x, mask, pos):
        cos, sin = rope_cos_sin(pos, D)

        def body(h, lp):
            xx = rms_norm(h, lp["in_n"])
            if fuse_qkv:
                qkv = xx @ lp["qkv_w"]
                q = split_heads(qkv[..., : NH * D], NH)
                k = split_heads(qkv[..., NH * D : (NH + KVH) * D], KVH)
                v = split_heads(qkv[..., (NH + KVH) * D :], KVH)
            else:
                q = split_heads(xx @ lp["q_w"], NH)
                k = split_heads(xx @ lp["k_w"], KVH)
                v = split_heads(xx @ lp["v_w"], KVH)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            a = merge_heads(grouped_attention(q, k, v, mask, 50.0))
            h = h + a @ lp["o_w"]
            xx = rms_norm(h, lp["post_n"])
            if fuse_gateup:
                gu = xx @ lp["gu_w"]
                mlp = jax.nn.gelu(gu[..., :I], approximate=True) * gu[..., I:]
            else:
                mlp = jax.nn.gelu(xx @ lp["gate_w"], approximate=True) * (
                    xx @ lp["up_w"]
                )
            h = h + mlp @ lp["down_w"]
            return h, (k, v)

        h, kv = jax.lax.scan(body, x, params)
        return h, kv

    return jax.jit(run)


def main():
    x = mk((1, S, H), scale=1.0)
    mask = jnp.ones((1, S, S), bool)
    pos = jnp.arange(S, dtype=jnp.int32)[None]

    import time as _time

    for fq, fg in [(False, False), (True, False), (False, True), (True, True)]:
        t0 = _time.time()
        params = make_params(fq, fg)
        fn = make_fn(fq, fg)
        per_iter, _, _ = timed_call(lambda p: fn(p, x, mask, pos)[0], params, iters=15)
        print(
            f"fuse_qkv={fq} fuse_gateup={fg}: {per_iter * 1e3:.3f} ms"
            f" (variant wall {_time.time() - t0:.0f}s)",
            flush=True,
        )
        del params


if __name__ == "__main__":
    main()
