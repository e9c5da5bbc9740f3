"""Full Pi-0 step latency at serving batch sizes: XLA attention vs Pallas
flash kernel.

The batch-1 verdict is settled (flash SLOWER at S=277, batch 1 —
docs/results/stage_budget_v5e.md); this asks the UNANSWERED question for the
serving regime: at batch 8-16 the prefill becomes compute-bound and the
score matrix is 8-16x larger, which is where a fused flash kernel's
HBM-traffic savings could finally pay. One process, bf16, bridge_step1 dims.
"""

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

BATCHES = [1, 8, 16]


def make_inputs(cfg, bsz):
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
        jnp.asarray(
            rng.randn(bsz, cfg["cond_steps"], cfg["proprio_dim"]), jnp.bfloat16
        ),
        jnp.asarray(
            rng.randn(bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16
        ),
    )


def main():
    rows = []
    for flash in (False, True):
        gc.collect()
        cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
        cfg["num_inference_steps"] = 1
        cfg["joint"]["config"]["use_flash_attn"] = flash
        model = PiZero(cfg)
        params = fake_params(model, jnp.bfloat16)
        params = model.tie_action_proprio_weights(params)
        step = jax.jit(model.infer_action)
        for bsz in BATCHES:
            args = make_inputs(cfg, bsz)
            t, _, _ = timed_call(step, params, *args, warmup=3, iters=20)
            chunks_s = bsz / t
            rows.append((flash, bsz, t * 1000, chunks_s))
            print(
                f"use_flash_attn={flash} batch={bsz:2d}: {t*1000:7.2f} ms "
                f"({chunks_s:6.1f} chunks/s)",
                flush=True,
            )
            del args
        del params, step, model

    print("\nflash vs xla by batch:")
    for bsz in BATCHES:
        x = next(r for r in rows if not r[0] and r[1] == bsz)
        f = next(r for r in rows if r[0] and r[1] == bsz)
        print(
            f"  batch {bsz:2d}: xla {x[2]:.2f} ms vs flash {f[2]:.2f} ms "
            f"-> flash is {x[2]/f[2]:.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
