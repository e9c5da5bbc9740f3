#!/usr/bin/env python3
"""Closed-loop Jacobi warm-start: realized sweep counts, cold vs warm.

Round-4 verdict Next #1: the README/SERVING claim that ``init_guess`` —
seeding each control step's Jacobi iteration with the PREVIOUS step's
action tokens — "buys the low rungs in a robot loop" had zero closed-loop
measurement. This harness drives the action-coupled fake env
(agent/fake_env.py: observations are pure functions of the integrated
action history, so consecutive steps see correlated images) with the full
OpenVLA stack and records, per control step, the sweep count the fixed
point actually needed under

- cold: default seeding (prefill token broadcast), and
- warm: ``init_guess`` = the previous control step's decoded tokens
  (first step of each episode falls back to cold — there is no previous).

Both converge to the SAME fixed point (the greedy chain — losslessness is
seed-independent, models/openvla/model.py:predict_action_tokens_jacobi),
asserted per step; the env advances on those shared tokens, so cold and
warm are measured on the identical trajectory. Natural coupling of the
random-weight models is non-trivial (random-minivla mean 4.5 sweeps at
alpha=1, docs/results/jacobi_convergence_v5e.csv), so no coupling knob is
needed here.

Writes docs/results/jacobi_warmstart_v5e.csv (per-step rows) and prints
the per-model aggregate. Chip run: ``python experiments/jacobi_warmstart.py
random-minivla random``; CPU smoke: ``BLURR_PLATFORM=cpu ... random
--episodes 1 --steps 4``.

Reference bar: the per-control-step predict_action dispatch this decode
replaces (reference scripts/eval_hf_vla_simpler.py:936).
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

OUT_CSV = REPO_ROOT / "docs" / "results" / "jacobi_warmstart_v5e.csv"


def run_model(model_id: str, episodes: int, steps: int, rows: list) -> dict:
    import jax
    import jax.numpy as jnp

    from blurr_tpu.agent.fake_env import FakeSimplerEnv
    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.models.openvla.processing import (
        StubLlamaTokenizer,
        process_image,
        tokenize_prompt_ids,
    )

    built = build_openvla(model_id, dtype=jnp.bfloat16)
    tokenizer = built.tokenizer or StubLlamaTokenizer()
    model, params = built.model, built.params
    spec = built.spec

    @jax.jit
    def step_cold(p, ids, px):
        return model.predict_action_tokens_jacobi(p, ids, px,
                                                  return_iters=True)

    @jax.jit
    def step_warm(p, ids, px, guess):
        return model.predict_action_tokens_jacobi(p, ids, px,
                                                  init_guess=guess,
                                                  return_iters=True)

    env = FakeSimplerEnv(image_hw=(128, 128))
    instruction = env.get_language_instruction()
    ids_list = tokenize_prompt_ids(tokenizer, instruction)
    ids = jnp.asarray([ids_list], jnp.int32)

    cold_iters, warm_iters = [], []
    for ep in range(episodes):
        obs, _ = env.reset(options={"obj_init_options": {"episode_id": ep}})
        prev_toks = None
        for t in range(steps):
            px = jnp.asarray(process_image(
                np.asarray(obs["image"]), int(spec.siglip.image_size),
                bool(spec.use_fused_vision),
            ))
            toks_c, it_c = step_cold(params, ids, px)
            if prev_toks is None:
                toks_w, it_w = toks_c, it_c  # no previous step to seed from
            else:
                toks_w, it_w = step_warm(params, ids, px, prev_toks)
            np.testing.assert_array_equal(
                np.asarray(toks_w), np.asarray(toks_c),
                err_msg="warm-started fixed point diverged from cold",
            )
            if prev_toks is not None:  # only seeded steps enter the stats
                cold_iters.append(int(it_c))
                warm_iters.append(int(it_w))
                rows.append({
                    "model": model_id, "episode": ep, "step": t,
                    "iters_cold": int(it_c), "iters_warm": int(it_w),
                })
            prev_toks = toks_c
            actions = model.detokenize_actions(np.asarray(toks_c))[0]
            obs, _, success, truncated, _ = env.step(actions)
            if success or truncated:
                break
    del params

    c, w = np.asarray(cold_iters), np.asarray(warm_iters)
    agg = {
        "model": model_id, "n_steps": len(c),
        "cold_mean": round(float(c.mean()), 2),
        "cold_p95": float(np.percentile(c, 95)),
        "cold_max": int(c.max()),
        "warm_mean": round(float(w.mean()), 2),
        "warm_p95": float(np.percentile(w, 95)),
        "warm_max": int(w.max()),
        "warm_wins_frac": round(float(np.mean(w < c)), 3),
        "warm_ties_frac": round(float(np.mean(w == c)), 3),
    }
    print(agg, flush=True)
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=["random-minivla", "random"])
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=str(OUT_CSV))
    args = ap.parse_args()
    models = args.models or ["random-minivla", "random"]

    rows: list = []
    aggs = [run_model(m, args.episodes, args.steps, rows) for m in models]
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out} ({len(rows)} per-step rows)")
    for a in aggs:
        print(a)


if __name__ == "__main__":
    main()
