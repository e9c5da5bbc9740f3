"""Full Pi-0 step latency: XLA attention vs Pallas flash kernel."""

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


def make_inputs(cfg):
    rng = np.random.RandomState(0)
    seq = cfg["max_image_text_tokens"]
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    ids = np.zeros((1, seq), np.int32)
    am = np.zeros((1, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + 10] = rng.randint(3, 1000, (1, 10))
    am[:, : n_img + 10] = 1
    img = cfg["vision"]["config"]["image_size"]
    return (
        jnp.asarray(ids),
        jnp.asarray(am),
        jnp.asarray(rng.rand(1, 3, img, img) * 2 - 1, jnp.bfloat16),
        jnp.asarray(rng.randn(1, cfg["cond_steps"], cfg["proprio_dim"]), jnp.bfloat16),
        jnp.asarray(rng.randn(1, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16),
    )


def main():
    import gc

    for flash in (False, True):
        gc.collect()
        cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
        cfg["num_inference_steps"] = 1
        cfg["joint"]["config"]["use_flash_attn"] = flash
        model = PiZero(cfg)
        params = fake_params(model, jnp.bfloat16)
        params = model.tie_action_proprio_weights(params)
        args = make_inputs(cfg)
        step = jax.jit(model.infer_action)
        t, _, _ = timed_call(step, params, *args, warmup=3, iters=20)
        print(f"use_flash_attn={flash}: {t*1000:.2f} ms", flush=True)
        del params, args, step, model


if __name__ == "__main__":
    main()
