#!/usr/bin/env python3
"""Attribute the batched-eval scaling anomaly: per-phase timing of the
lockstep control round at N in {1, 2, 4, 8}.

Motivation (round-3 verdict Weak #4): batched_eval_v5e.csv showed
batch_envs=2 running at HALF batch 1's env-steps/s (15.5 vs 29.6) and
batch 8 at only 1.18x — directly contradicting the README's amortization
claim. Candidates named by the verdict: per-request tunnel RTT dominating,
serial per-slot host preprocessing despite the thread pool, staggered-reset
recompiles. This harness instruments ONE control round at a time:

  preprocess  — per-slot adapter.preprocess (cv2 + tokenizer), pooled
  stack       — host-side np.concatenate of the N slots
  upload      — jnp.asarray/device_put of the stacked inputs (fetch-fenced)
  infer+fetch — the jitted batched step + np.asarray of the chunk
  env         — act_steps fake-env steps for every slot

plus a recompile guard (jax cache size before/after the measured rounds).
Writes docs/results/batched_eval_phases_v5e.csv.
"""

from __future__ import annotations

import csv
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

import blurr_tpu.agent.batched_eval as batched_mod
import blurr_tpu.agent.eval_agent as eval_agent_mod
from blurr_tpu.benchmarks import load_cfg
from blurr_tpu.config.core import Config
from experiments.fastinit import fake_params

BATCH_SWEEP = [1, 2, 4, 8]
ROUNDS = 12
OUT_CSV = (Path(__file__).resolve().parents[1] / "docs" / "results"
           / "batched_eval_phases_v5e.csv")


def main() -> None:
    base = load_cfg("config/eval/bridge_step1.yaml")
    base["act_steps"] = 4
    base["n_video"] = 0
    base["log_dir"] = "/tmp/batched_eval_phases"
    base["checkpoint_path"] = None
    base["use_bf16"] = True
    base["env"]["task"] = "fake_widowx_carrot_on_plate"

    from blurr_tpu.models.pi0.pizero import PiZeroInference

    shared = fake_params(PiZeroInference(base), jnp.bfloat16)
    orig_load = eval_agent_mod.EvalAgent.load_checkpoint
    eval_agent_mod.EvalAgent.load_checkpoint = lambda self, path: shared

    rows = []
    try:
        for n in BATCH_SWEEP:
            cfg = Config.wrap(dict(base))
            cfg["batch_envs"] = n
            cfg["n_eval_episode"] = n
            agent = batched_mod.BatchedEvalAgent(cfg)

            slots = []
            for i in range(n):
                env, adapter = agent.envs[i], agent.adapters[i]
                obs, _ = env.reset(
                    options={"obj_init_options": {"episode_id": i}})
                adapter.reset()
                slots.append((env, adapter, obs,
                              env.get_language_instruction()))

            def preprocess():
                if agent._pool is not None and n > 1:
                    return list(agent._pool.map(
                        lambda s: s[1].preprocess(s[0], s[2], s[3]), slots))
                return [s[1].preprocess(s[0], s[2], s[3]) for s in slots]

            def one_round(measure=False):
                t = {}
                t0 = time.perf_counter()
                inputs = preprocess()
                t["preprocess_ms"] = (time.perf_counter() - t0) * 1000

                t0 = time.perf_counter()
                stacked = {
                    k: np.concatenate([np.asarray(inp[k]) for inp in inputs])
                    for k in inputs[0]
                }
                t["stack_ms"] = (time.perf_counter() - t0) * 1000

                # upload, fetch-fenced: a tiny sum forces materialization
                t0 = time.perf_counter()
                dev = {
                    "input_ids": jnp.asarray(stacked["input_ids"]),
                    "attention_mask": jnp.asarray(stacked["attention_mask"]),
                    "pixel_values": jnp.asarray(
                        stacked["pixel_values"].astype(agent.dtype)),
                    "proprios": jnp.asarray(
                        stacked["proprios"].astype(agent.dtype)),
                }
                float(dev["pixel_values"].sum())
                t["upload_ms"] = (time.perf_counter() - t0) * 1000

                t0 = time.perf_counter()
                out = agent._infer_batched(
                    agent.params, dev["input_ids"], dev["attention_mask"],
                    dev["pixel_values"], dev["proprios"],
                    agent._base_key, agent._step_idx)
                actions = np.asarray(out, np.float32)
                t["infer_fetch_ms"] = (time.perf_counter() - t0) * 1000
                agent._step_idx += 1

                # the FIXED path (in-graph stacking, one fetch per round):
                # agent._batched_infer on the per-slot device inputs
                t0 = time.perf_counter()
                agent._batched_infer(inputs)
                t["fixed_path_ms"] = (time.perf_counter() - t0) * 1000

                t0 = time.perf_counter()
                for i, (env, adapter, obs, instr) in enumerate(slots):
                    env_actions = adapter.postprocess(actions[i])
                    for a in env_actions[: agent.act_steps]:
                        obs, _, _, trunc, _ = env.step(a)
                        if trunc:
                            obs, _ = env.reset(options={
                                "obj_init_options": {"episode_id": i}})
                            adapter.reset()
                            break
                    slots[i] = (env, adapter, obs,
                                env.get_language_instruction())
                t["env_ms"] = (time.perf_counter() - t0) * 1000
                return t

            one_round()  # compile + warm caches
            one_round()
            n_compiles_before = agent._infer_batched._cache_size() if hasattr(
                agent._infer_batched, "_cache_size") else -1
            acc = {}
            for _ in range(ROUNDS):
                for k, v in one_round(measure=True).items():
                    acc.setdefault(k, []).append(v)
            n_compiles_after = agent._infer_batched._cache_size() if hasattr(
                agent._infer_batched, "_cache_size") else -1
            row = {"batch_envs": n}
            for k, vs in acc.items():
                row[k] = round(float(np.median(vs)), 2)
            row["total_ms"] = round(sum(
                float(np.median(vs)) for vs in acc.values()), 2)
            row["recompiles_during_measure"] = (
                n_compiles_after - n_compiles_before
                if n_compiles_before >= 0 else "")
            rows.append(row)
            print(row, flush=True)
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
