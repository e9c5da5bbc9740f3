#!/usr/bin/env python3
"""Map Jacobi fixed-point sweep count vs sequential token coupling.

Why this instrument: the sweep count at the fixed point — the k that picks
the rung on the measured latency ladder (jacobi_decode_v5e.csv) — depends
on how strongly token i's greedy conditional depends on tokens < i versus
on the prompt. Random full-width weights are DEGENERATE here (near-constant
argmax -> k=1), and "sharpen the lm_head" does not move greedy decode at
all (argmax is scale-invariant), so neither gives a trustworthy bound for
trained checkpoints.

The controllable knob: scale the DECODE-SIDE token-embedding feedback by
alpha. Generated tokens re-enter the model only through
``params['embed_tokens'][tok]`` (both AR and Jacobi paths), so

- alpha = 0: conditionals depend only on the prompt -> one sweep,
- alpha = 1: the model's natural coupling,
- alpha >> 1: guess-hypersensitive conditionals -> worst case n-1.

Prompt embeddings are built from the UNSCALED table, so alpha attenuates
exactly the sequential-feedback term. At every (alpha, seed) the harness
asserts Jacobi tokens == AR tokens (both under the same alpha-model —
losslessness is coupling-independent), then records the sweep count.

Models: random-minivla (realistic 0.5B widths) and the tiny test spec
(whose natural coupling sits at the worst case — the CPU suite measures 6
sweeps). alpha enters as DATA (one compile per model; CLAUDE.md: batch
experiments into one process). Writes docs/results/jacobi_convergence_v5e.csv.
"""

import csv
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

ALPHAS = [0.0, 0.125, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0]
SEEDS = list(range(10))
N_NEW = 7  # action_dim
PROMPT = 24


def main() -> None:
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla import llama as llama_lib
    from blurr_tpu.models.openvla.model import RANDOM_SPECS

    rows = []
    for model_id in ("random-minivla", "random-minivla-tiny"):
        spec = RANDOM_SPECS[model_id]().llama
        params = llama_lib.init_llama_params(
            jax.random.PRNGKey(0), spec, jnp.bfloat16)

        def with_alpha(p, alpha):
            q = dict(p)
            q["embed_tokens"] = p["embed_tokens"] * alpha.astype(
                p["embed_tokens"].dtype)
            # Both specs tie lm_head to embed_tokens; pin the logits head to
            # the UNSCALED table or alpha would scale the logits too — at
            # alpha=0 that degenerates to argmax-of-zeros (constant token 0),
            # measuring a zero head instead of prompt-only conditionals.
            # For alpha>0 argmax is scale-invariant so rows are unaffected.
            if "lm_head" not in p:
                q["lm_head"] = jnp.swapaxes(p["embed_tokens"], 0, 1)
            return q

        @jax.jit
        def run_jacobi(p, alpha, embeds, valid):
            toks, iters = llama_lib.greedy_generate_jacobi(
                with_alpha(p, alpha), spec, embeds, valid, N_NEW,
                return_iters=True)
            return toks, iters

        @jax.jit
        def run_ar(p, alpha, embeds, valid):
            return llama_lib.greedy_generate(
                with_alpha(p, alpha), spec, embeds, valid, N_NEW)

        valid = jnp.ones((1, PROMPT), jnp.int32)
        for alpha in ALPHAS:
            a = jnp.float32(alpha)
            iters_seen, exact_all = [], True
            for seed in SEEDS:
                rng = np.random.RandomState(seed)
                # prompt embeds from the unscaled table: random token ids
                ids = rng.randint(3, min(spec.vocab_size, 30000), (1, PROMPT))
                embeds = params["embed_tokens"][jnp.asarray(ids)].astype(
                    jnp.bfloat16)
                toks_j, it = run_jacobi(params, a, embeds, valid)
                toks_a = run_ar(params, a, embeds, valid)
                exact_all &= bool(
                    (np.asarray(toks_j) == np.asarray(toks_a)).all())
                iters_seen.append(int(it))
            row = {
                "model": model_id, "alpha": alpha,
                "iters_min": min(iters_seen),
                "iters_mean": round(float(np.mean(iters_seen)), 2),
                "iters_max": max(iters_seen),
                "exact": exact_all, "n_seeds": len(SEEDS),
            }
            rows.append(row)
            print(row, flush=True)
        del params

    out = REPO_ROOT / "docs/results/jacobi_convergence_v5e.csv"
    with out.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
