"""Batched-eval throughput sweep on the real chip.

Measures aggregate evaluation throughput (env-steps/s and episodes/hour) of
BatchedEvalAgent at N in {1, 2, 4, 8} lockstep fake envs, full
bridge_step1.yaml dims in bf16. The batch-1 control step is
weight-bandwidth-bound (docs/results/stage_budget_v5e.md), so batching
amortizes the weight traffic: the model-only ceiling is the
benchmark_pi0 --batch-size ladder (122 -> 590 chunks/s); this measures how
much of it survives the agent loop (adapter preprocess on host, one fetch
per control step).

Caveat (same as serving_slo_v5e.md): in this dev environment every fetch
crosses the axon tunnel (~28-32 ms RTT floor, drifts run-to-run), which sits
on the critical path once per control step and caps the visible win; the
host-attached projection divides it out. All points run in ONE process (one
~15 s remote compile per batch size), each with an unmeasured warmup run.

Writes docs/results/batched_eval_v5e.csv. Run on the v5e; ~6-8 min.
"""

from __future__ import annotations

import csv
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

import blurr_tpu.agent.batched_eval as batched_mod
import blurr_tpu.agent.eval_agent as eval_agent_mod
from blurr_tpu.benchmarks import load_cfg
from blurr_tpu.config.core import Config
from experiments.fastinit import fake_params

BATCH_SWEEP = [1, 2, 4, 8]
ACT_STEPS = 4
EPISODES_PER_SLOT = 4  # measured run: 4 episodes x 12 steps per slot
OUT_CSV = (
    Path(__file__).resolve().parents[1]
    / "docs" / "results" / "batched_eval_v5e.csv"
)


def main():
    base = load_cfg("config/eval/bridge_step1.yaml")
    base["act_steps"] = ACT_STEPS
    base["n_video"] = 0
    base["log_dir"] = "/tmp/batched_eval_runs"
    base["checkpoint_path"] = None
    base["use_bf16"] = True
    base["env"]["task"] = "fake_widowx_carrot_on_plate"

    # one shared fake param tree (iota pattern — MXU timing identical to
    # random weights, no slow remote RNG compiles), device-resident once
    from blurr_tpu.models.pi0.pizero import PiZeroInference

    shared = fake_params(PiZeroInference(base), jnp.bfloat16)
    orig_load = eval_agent_mod.EvalAgent.load_checkpoint
    eval_agent_mod.EvalAgent.load_checkpoint = lambda self, path: shared

    rows = []
    try:
        for n in BATCH_SWEEP:
            cfg = Config.wrap(dict(base))
            cfg["batch_envs"] = n
            cfg["n_eval_episode"] = n  # warmup: 1 episode/slot (incl. compile)
            agent = batched_mod.BatchedEvalAgent(cfg)
            agent.run()

            agent.n_eval_episode = n * EPISODES_PER_SLOT
            t0 = time.time()
            agent.run()
            wall = time.time() - t0
            episodes = n * EPISODES_PER_SLOT
            env_steps = episodes * 12  # fake env always truncates at 12
            rows.append({
                "batch_envs": n,
                "episodes": episodes,
                "wall_s": round(wall, 3),
                "env_steps_per_s": round(env_steps / wall, 2),
                "episodes_per_hour": round(episodes / wall * 3600, 1),
                "ms_per_control_step": round(
                    1000.0 * wall / (env_steps / ACT_STEPS / n), 2
                ),
            })
            print(rows[-1], flush=True)
            del agent
            gc.collect()
    finally:
        eval_agent_mod.EvalAgent.load_checkpoint = orig_load

    OUT_CSV.parent.mkdir(parents=True, exist_ok=True)
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV}", flush=True)


if __name__ == "__main__":
    main()
