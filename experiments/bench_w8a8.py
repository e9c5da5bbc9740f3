"""Full Pi-0 step latency: bf16 vs W8A8-quantized VLM mixture."""

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
from experiments.bench_flash import make_inputs
from experiments.fastinit import fake_params


def main():
    for mode in (None, "w8a8"):
        gc.collect()
        cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
        cfg["num_inference_steps"] = 1
        if mode:
            cfg["vlm_quantization"] = {"mode": mode}
            cfg["action_quantization"] = {"mode": mode}
        model = PiZero(cfg)
        params = fake_params(model, jnp.bfloat16)
        params = model.tie_action_proprio_weights(params)
        params = model.enable_action_quantization(params)
        params = model.enable_vlm_quantization(params)
        args = make_inputs(cfg)
        step = jax.jit(model.infer_action)
        t, _, _ = timed_call(step, params, *args, warmup=3, iters=20)
        print(f"vlm_quant={mode}: {t*1000:.2f} ms", flush=True)
        del params, args, step, model


if __name__ == "__main__":
    main()
