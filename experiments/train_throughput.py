"""Training-step throughput of the production train path on one v5e chip.

docs/results/remat_memory_v5e.csv proves the complete masked-adamw step FITS
(canonical tied tree + remat + donation); this measures how FAST it runs:
per-step latency, samples/s, and model-FLOP/s (MFU) at the batch sizes the
memory study showed fitting (8 and 32).

Protocol: fake deterministic weights (fastinit — MXU timing identical to
random, skips ~150 s of remote RNG compiles), the EXACT production step
(make_optax_train_step(remat=True, donate=True), masked adamw action-expert
scope, in-step noise/flow-time sampling), synthetic full-dims batch.
Donation consumes the inputs each call, so timing CHAINS the state
(params/opt_state thread through) and uses the two-point fetch-fenced scheme
(blurr_tpu.utils.monitor rationale: only fetches block on axon).

MFU convention: model FLOPs = 3 x forward (fwd + 2x backward), the standard
that does NOT credit remat recompute as useful work; forward = one naive
joint pass + vision (flow_loss does one flow step). v5e peak = 197 bf16
TFLOP/s per chip.

Writes docs/results/train_throughput_v5e.csv. ~6-10 min (2 compiles).
"""

from __future__ import annotations

import csv
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from blurr_tpu.utils.optim import masked_freeze
from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0 import trainable
from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.parallel.train import make_optax_train_step
from blurr_tpu.paths import config_root
from blurr_tpu.utils.flops import pi0_forward_flops
from experiments.fastinit import fake_params
from scripts.train_pi0_flow import synthetic_batch  # the CLI's exact batch

BATCHES = [8, 32]
ITERS = 6
V5E_PEAK_TFLOPS = 197.0  # bf16, one v5e chip
OUT_CSV = Path(__file__).resolve().parents[1] / "docs" / "results" / "train_throughput_v5e.csv"


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    cfg["use_bf16"] = True
    model = PiZero(cfg)

    # production training tree: tied -> canonical (proprio rides action)
    params = model.canonicalize_tied_weights(
        model.tie_action_proprio_weights(fake_params(model, jnp.bfloat16))
    )
    tx = masked_freeze(
        optax.adamw(optax.warmup_cosine_decay_schedule(1e-6, 1e-4, 10, 1000)),
        trainable.action_expert_mask(params),
    )
    opt_state = tx.init(params)
    step = make_optax_train_step(model, tx, remat=True, donate=True)

    # one flow_loss forward = ONE naive joint pass + vision
    fwd_cfg = dict(cfg)
    fwd_cfg["num_inference_steps"] = 1

    rows = []
    key = jax.random.PRNGKey(0)
    for bsz in BATCHES:
        batch = jax.tree.map(
            jnp.asarray, synthetic_batch(cfg, bsz, np.random.RandomState(0))
        )

        def run(k):
            nonlocal params, opt_state, key
            loss = None
            t0 = time.perf_counter()
            for _ in range(k):
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, batch, sub)
            loss_f = float(loss)  # fetch fence (the only blocking op on axon)
            return time.perf_counter() - t0, loss_f

        t_compile0 = time.perf_counter()
        _, loss0 = run(1)  # compile + first step
        compile_s = time.perf_counter() - t_compile0
        assert np.isfinite(loss0), f"non-finite loss at batch {bsz}"
        run(1)  # settle
        t_base, _ = run(1)
        t_full, _ = run(1 + ITERS)
        per_step = max((t_full - t_base) / ITERS, 1e-9)

        fwd_flops = pi0_forward_flops(fwd_cfg, use_cache=False, batch=bsz)
        model_tflops = 3.0 * fwd_flops / per_step / 1e12
        row = {
            "batch": bsz,
            "step_ms": round(per_step * 1000, 1),
            "samples_per_s": round(bsz / per_step, 2),
            "model_tflops_per_s": round(model_tflops, 1),
            "mfu_pct": round(100 * model_tflops / V5E_PEAK_TFLOPS, 1),
            "compile_s": round(compile_s, 1),
            "loss_finite": True,
        }
        rows.append(row)
        print(row, flush=True)

    OUT_CSV.parent.mkdir(parents=True, exist_ok=True)
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV}", flush=True)


if __name__ == "__main__":
    main()
