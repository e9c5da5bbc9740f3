"""pool64 preset latency + batched throughput on the real chip."""

import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call
from experiments.fastinit import fake_params


def make_inputs(cfg, bsz=1):
    rng = np.random.RandomState(0)
    seq = cfg["max_image_text_tokens"]
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    ids = np.zeros((bsz, seq), np.int32)
    am = np.zeros((bsz, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + 10] = rng.randint(3, 1000, (bsz, 10))
    am[:, : n_img + 10] = 1
    img = cfg["vision"]["config"]["image_size"]
    return (
        jnp.asarray(ids),
        jnp.asarray(am),
        jnp.asarray(rng.rand(bsz, 3, img, img) * 2 - 1, jnp.bfloat16),
        jnp.asarray(rng.randn(bsz, cfg["cond_steps"], cfg["proprio_dim"]), jnp.bfloat16),
        jnp.asarray(rng.randn(bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16),
    )


def bench(config_name, steps=None, bsz=1, label="", iters=10):
    gc.collect()
    cfg = load_yaml(config_root() / "eval" / config_name)
    if steps is not None:
        cfg["num_inference_steps"] = steps
    cfg["use_bf16"] = True
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    args = make_inputs(cfg, bsz)
    step = jax.jit(model.infer_action)
    t, _, _ = timed_call(step, params, *args, warmup=2, iters=iters)
    thr = bsz / t
    print(f"{label or config_name}: {t*1000:.2f} ms/call, {thr:.1f} chunks/s (batch {bsz})", flush=True)
    del params, args, step, model


if __name__ == "__main__":
    bench("bridge_pool64_steps2.yaml", label="pool64 int8 2-step (112px, 64 tok)")
    bench("bridge.yaml", steps=1, bsz=8, label="blurr bf16 1-step, batch 8")
