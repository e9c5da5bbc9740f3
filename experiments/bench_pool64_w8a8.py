"""Compose the two orthogonal speed levers: pool64 (64 vision tokens,
112px frames) x W8A8 (int8 MXU). Measures the full Pi-0 step at 1 flow step.

At 64+20 = 84 prefix tokens the VLM prefill drops below the int8 ridge point
(arith intensity ~84 << 481 flops/byte), so the step should approach the
weight-bandwidth floor (~1.81 GB int8 / 819 GB/s ~ 2.2 ms) + vision + action
expert, rather than the S=276 compute-bound 3.3 ms.
"""

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


def run(config_name, w8a8):
    gc.collect()
    cfg = load_yaml(config_root() / "eval" / config_name)
    cfg["num_inference_steps"] = 1
    cfg["use_bf16"] = True
    # strip the pool64 preset's weight-only int8 (not a TPU win); w8a8 instead
    cfg["action_quantization"] = {"mode": None}
    cfg["kv_quantization"] = {"mode": None}
    if w8a8:
        cfg["vlm_quantization"] = {"mode": "w8a8", "include_vision": True}
        cfg["action_quantization"] = {"mode": "w8a8"}
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    args = make_inputs(cfg)
    step = jax.jit(model.infer_action)
    t, _, _ = timed_call(step, params, *args, warmup=3, iters=20)
    tag = "w8a8" if w8a8 else "bf16"
    print(f"{config_name:28s} {tag}: {t*1000:7.2f} ms  ({1000/(t*1000):5.1f} Hz)",
          flush=True)
    del params, args, step, model


def main():
    for config_name in ("bridge.yaml", "bridge_pool64_steps2.yaml"):
        for w8a8 in (False, True):
            run(config_name, w8a8)


if __name__ == "__main__":
    main()


def run_short_pad(seq, w8a8=True):
    """pool64 with the pad length shrunk to the actual 64+text content.

    The reference pads every prompt to max_seq_len=276 even with 64 vision
    tokens, so its pool64 preset still pays the full-276 prefill. Shapes are
    episode-constant on TPU, so a preset-static shorter pad is free."""
    gc.collect()
    cfg = load_yaml(config_root() / "eval" / "bridge_pool64_steps2.yaml")
    cfg["num_inference_steps"] = 1
    cfg["use_bf16"] = True
    cfg["max_seq_len"] = seq
    cfg["max_image_text_tokens"] = seq
    cfg["env"]["adapter"]["max_seq_len"] = seq
    cfg["action_quantization"] = {"mode": None}
    cfg["kv_quantization"] = {"mode": None}
    if w8a8:
        cfg["vlm_quantization"] = {"mode": "w8a8", "include_vision": True}
        cfg["action_quantization"] = {"mode": "w8a8"}
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    args = make_inputs(cfg)
    step = jax.jit(model.infer_action)
    t, _, _ = timed_call(step, params, *args, warmup=3, iters=20)
    tag = "w8a8" if w8a8 else "bf16"
    print(f"pool64 pad={seq:3d} {tag}: {t*1000:7.2f} ms  ({1000/(t*1000):5.1f} Hz)",
          flush=True)
    del params, args, step, model
