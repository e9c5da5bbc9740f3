"""TPU ablation ladder for the README (full bridge dims, bf16):
naive 10 steps -> +prefix cache (10) -> fewer steps (4) -> 1 step -> +w8a8."""

import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call
from experiments.bench_flash import make_inputs
from experiments.fastinit import fake_params


def run(label, steps, cache, w8a8=False, iters=8):
    gc.collect()
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    cfg["num_inference_steps"] = steps
    if w8a8:
        cfg["vlm_quantization"] = {"mode": "w8a8"}
        cfg["action_quantization"] = {"mode": "w8a8"}
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    args = make_inputs(cfg)
    fn = model.infer_action if cache else model.infer_action_naive
    step = jax.jit(fn)
    t, _, _ = timed_call(step, params, *args, warmup=2, iters=iters)
    print(f"{label}: {t*1000:.2f} ms", flush=True)
    del params, args, step, model


if __name__ == "__main__":
    run("bf16 naive, 10 steps (no cache)", 10, cache=False, iters=4)
    run("bf16 + prefix KV cache, 10 steps", 10, cache=True)
    run("bf16 + cache, 4 steps", 4, cache=True)
    run("bf16 + cache, 1 step (BLURR)", 1, cache=True)
    run("w8a8 + cache, 1 step", 1, cache=True, w8a8=True)
