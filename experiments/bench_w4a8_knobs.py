"""Latency cost of the w4a8 accuracy knobs (round-4 follow-up to the
closed-loop ladder in docs/results/quant_closed_loop_v5e.md).

The MSE-clip scale search is quantization-time only (identical kernel), but
``group_size=128`` makes the Pallas int4 kernel statically unroll 4x more
int32 group-dots, and ``int8_keys=["down_w"]`` moves the biggest MLP matrix
back to int8 (2x the weight bytes on the fastest-moving tensor). This
measures what each accuracy rung costs on the shipped fastest preset
(bridge_pool64_w4a8_steps1.yaml, full dims, 1 flow step) so the
promote/keep decision can weigh MAE against Hz.

All rungs run in ONE process back-to-back (ratios robust to host load).
Writes docs/results/w4a8_knobs_latency_v5e.csv. Run on the v5e.
"""

from __future__ import annotations

import csv
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

OUT_CSV = (Path(__file__).resolve().parents[1] / "docs" / "results"
           / "w4a8_knobs_latency_v5e.csv")

# rung -> (group_size, int8_keys); closed-loop first-chunk action MAE from
# quant_closed_loop_v5e.md (full-dims rows, same knobs)
RUNGS = {
    "g512": (512, (), 0.0306),
    "g128": (128, (), 0.0269),
    "g512_down8": (512, ("down_w",), 0.0326),
    "g128_down8": (128, ("down_w",), 0.0257),
}


def run(group_size: int, int8_keys: tuple) -> float:
    gc.collect()
    cfg = load_yaml(config_root() / "eval" / "bridge_pool64_w4a8_steps1.yaml")
    cfg["num_inference_steps"] = 1
    cfg["use_bf16"] = True
    for key in ("vlm_quantization", "action_quantization"):
        q = dict(cfg.get(key) or {})
        q["group_size"] = group_size
        q["int8_keys"] = list(int8_keys)
        cfg[key] = q
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    args = make_inputs(cfg)
    step = jax.jit(model.infer_action)
    t, _, _ = timed_call(step, params, *args, warmup=3, iters=20)
    del params, args, step, model
    return t * 1000


def main():
    rows = []
    for tag, (g, keys, mae) in RUNGS.items():
        ms = run(g, keys)
        rows.append({"rung": tag, "group_size": g,
                     "int8_keys": "+".join(keys) or "none",
                     "step_ms": round(ms, 2), "hz": round(1000 / ms, 1),
                     "closed_loop_action_mae": mae})
        print(f"{tag:12s} g={g:<4d} int8={'+'.join(keys) or '-':8s} "
              f"{ms:6.2f} ms ({1000/ms:5.1f} Hz)  MAE {mae}", flush=True)
    OUT_CSV.parent.mkdir(parents=True, exist_ok=True)
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {OUT_CSV}", flush=True)


if __name__ == "__main__":
    main()
