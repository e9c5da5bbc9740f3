"""Async-pipeline control-rate measurement with a PACED fake env (verdict
Next #7).

The deployment regime SURVEY §7.5.6 describes: the simulator/robot takes
real time per env step. With act_steps=4 and a per-step sim time T_env, the
async pipeline dispatches chunk k+1 after the first sub-step of chunk k and
fetches after the last — hiding the device latency behind 3*T_env of env
stepping. This measures the control rate (env steps/s) with and without
--async-pipeline across a sweep of T_env, on the real chip at full
bridge.yaml dims.

Expected shape: async ≈ sync when T_env=0 (nothing to hide behind, fetch
still waits), wins when 0 < device_time <~ (act_steps-1)*T_env, converges
again when T_env alone dominates. Cost: executed actions are act_steps-1 env
steps stale (a CONTROL-QUALITY tradeoff this latency measurement cannot
see; the closed-loop divergence protocol covers behavior).

Writes docs/results/async_pipeline_v5e.csv. Run on the v5e; ~3-4 min
(one agent build + compile per async mode; pace varied on the same agent).
"""

from __future__ import annotations

import csv
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import blurr_tpu.agent.eval_agent as eval_agent_mod
from blurr_tpu.agent.fake_env import FakeSimplerEnv
from blurr_tpu.benchmarks import load_cfg
from blurr_tpu.config.core import Config

PACE_SWEEP_MS = [0.0, 5.0, 15.0, 30.0]
ACT_STEPS = 4
EPISODES = 6  # 72 env steps/point: enough to average out tunnel-RTT jitter
OUT_CSV = Path(__file__).resolve().parents[1] / "docs" / "results" / "async_pipeline_v5e.csv"


class PacedFakeEnv(FakeSimplerEnv):
    """FakeSimplerEnv that takes ``pace_s`` wall-clock per step (the sim/robot
    time the async pipeline hides device latency behind)."""

    pace_s = 0.0

    def step(self, action):
        if self.pace_s:
            time.sleep(self.pace_s)
        return super().step(action)


def build_agent(cfg_base, use_async: bool):
    cfg = Config.wrap(dict(cfg_base))
    cfg["async_pipeline"] = use_async
    orig_make = eval_agent_mod.make_env
    eval_agent_mod.make_env = lambda task: PacedFakeEnv(task)
    try:
        agent = eval_agent_mod.EvalAgent(cfg)
    finally:
        eval_agent_mod.make_env = orig_make
    # warm the compile outside any timed window
    PacedFakeEnv.pace_s = 0.0
    obs, _ = agent.env.reset()
    inputs = agent.env_adapter.preprocess(agent.env, obs, "warmup")
    agent._fetch(agent._dispatch(inputs))
    return agent


def run_once(agent, pace_ms: float, use_async: bool) -> dict:
    agent.env = PacedFakeEnv("fake_widowx_carrot_on_plate")
    PacedFakeEnv.pace_s = pace_ms / 1000.0
    t0 = time.time()
    agent.run()
    wall = time.time() - t0
    PacedFakeEnv.pace_s = 0.0
    env_steps = EPISODES * 12  # FakeSimplerEnv max_episode_steps
    return {
        "pace_ms": pace_ms,
        "async": use_async,
        "wall_s": round(wall, 3),
        "control_hz": round(env_steps / wall, 2),
        "ms_per_env_step": round(1000.0 * wall / env_steps, 2),
    }


def main():
    cfg = load_cfg("config/eval/bridge_step1.yaml")
    cfg["act_steps"] = ACT_STEPS
    cfg["n_eval_episode"] = EPISODES
    cfg["n_video"] = 0
    cfg["log_dir"] = "/tmp/async_pipeline_runs"
    cfg["checkpoint_path"] = None
    cfg["use_bf16"] = True
    cfg["env"]["task"] = "fake_widowx_carrot_on_plate"

    rows = []
    for use_async in (False, True):
        agent = build_agent(cfg, use_async)
        for pace in PACE_SWEEP_MS:
            r = run_once(agent, pace, use_async)
            rows.append(r)
            print(
                f"pace={pace:5.1f} ms async={use_async!s:5s}: "
                f"{r['control_hz']:6.2f} Hz ({r['ms_per_env_step']} ms/env step)",
                flush=True,
            )
        del agent

    rows.sort(key=lambda r: (r["pace_ms"], r["async"]))
    OUT_CSV.parent.mkdir(parents=True, exist_ok=True)
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV}", flush=True)


if __name__ == "__main__":
    main()
