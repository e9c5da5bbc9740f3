"""SigLIP tower latency variants: separate vs fused qkv, attention layouts."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import mha
from blurr_tpu.ops.norms import layer_norm
from blurr_tpu.utils.monitor import timed_call

L, N, D, I, NH = 27, 256, 1152, 4304, 16
HD = D // NH


def mk(shape, scale=0.02):
    n = int(np.prod(shape))
    return ((jnp.arange(n, dtype=jnp.float32) % 101 - 50) * (scale / 50)).reshape(shape).astype(jnp.bfloat16)


def params_separate():
    return {
        "ln1_w": jnp.ones((L, D), jnp.bfloat16), "ln1_b": jnp.zeros((L, D), jnp.bfloat16),
        "ln2_w": jnp.ones((L, D), jnp.bfloat16), "ln2_b": jnp.zeros((L, D), jnp.bfloat16),
        "q_w": mk((L, D, D)), "q_b": jnp.zeros((L, D), jnp.bfloat16),
        "k_w": mk((L, D, D)), "k_b": jnp.zeros((L, D), jnp.bfloat16),
        "v_w": mk((L, D, D)), "v_b": jnp.zeros((L, D), jnp.bfloat16),
        "o_w": mk((L, D, D)), "o_b": jnp.zeros((L, D), jnp.bfloat16),
        "fc1_w": mk((L, D, I)), "fc1_b": jnp.zeros((L, I), jnp.bfloat16),
        "fc2_w": mk((L, I, D)), "fc2_b": jnp.zeros((L, D), jnp.bfloat16),
    }


def split(x):
    b, s, _ = x.shape
    return x.reshape(b, s, NH, HD).transpose(0, 2, 1, 3)


def merge(x):
    b, n, s, h = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, n * h)


def fwd_separate(p, x):
    def block(h, lp):
        xx = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        q = split(xx @ lp["q_w"] + lp["q_b"])
        k = split(xx @ lp["k_w"] + lp["k_b"])
        v = split(xx @ lp["v_w"] + lp["v_b"])
        h = h + merge(mha(q, k, v)) @ lp["o_w"] + lp["o_b"]
        xx = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        h = h + jax.nn.gelu(xx @ lp["fc1_w"] + lp["fc1_b"], approximate=True) @ lp["fc2_w"] + lp["fc2_b"]
        return h, None
    return jax.lax.scan(block, x, p)[0]


def fwd_fused(p, x):
    qkv_w = jnp.concatenate([p["q_w"], p["k_w"], p["v_w"]], axis=-1)
    qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]], axis=-1)
    lp2 = dict(p)
    lp2["qkv_w"] = qkv_w
    lp2["qkv_b"] = qkv_b
    for k in ("q_w", "k_w", "v_w", "q_b", "k_b", "v_b"):
        lp2.pop(k)

    def block(h, lp):
        xx = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = xx @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = h + merge(mha(split(q), split(k), split(v))) @ lp["o_w"] + lp["o_b"]
        xx = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        h = h + jax.nn.gelu(xx @ lp["fc1_w"] + lp["fc1_b"], approximate=True) @ lp["fc2_w"] + lp["fc2_b"]
        return h, None
    return jax.lax.scan(block, x, lp2)[0]


def fwd_fused_flat_attn(p, x):
    """Fused qkv + attention over merged-head layout (avoid HD=72 lanes):
    compute logits via one [N, D] x [D, N] per head-group using einsum on
    [B, S, NH, HD]."""
    qkv_w = jnp.concatenate([p["q_w"], p["k_w"], p["v_w"]], axis=-1)
    qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]], axis=-1)
    lp2 = {k: v for k, v in p.items() if k not in ("q_w", "k_w", "v_w", "q_b", "k_b", "v_b")}
    lp2["qkv_w"] = qkv_w
    lp2["qkv_b"] = qkv_b

    def block(h, lp):
        xx = layer_norm(h, lp["ln1_w"], lp["ln1_b"])
        qkv = xx @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        qh = q.reshape(b, s, NH, HD)
        kh = k.reshape(b, s, NH, HD)
        vh = v.reshape(b, s, NH, HD)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32) * (HD**-0.5)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, s, D)
        h = h + attn @ lp["o_w"] + lp["o_b"]
        xx = layer_norm(h, lp["ln2_w"], lp["ln2_b"])
        h = h + jax.nn.gelu(xx @ lp["fc1_w"] + lp["fc1_b"], approximate=True) @ lp["fc2_w"] + lp["fc2_b"]
        return h, None
    return jax.lax.scan(block, x, lp2)[0]


def main():
    p = params_separate()
    x = mk((1, N, D), scale=1.0)
    for name, fn in [
        ("separate-qkv", fwd_separate),
        ("fused-qkv", fwd_fused),
        ("fused-qkv+flat-attn", fwd_fused_flat_attn),
    ]:
        f = jax.jit(fn)
        t, _, _ = timed_call(f, p, x, warmup=2, iters=20)
        print(f"{name}: {t*1000:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
