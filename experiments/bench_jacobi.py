#!/usr/bin/env python3
"""AR vs Jacobi self-speculative decode for the OpenVLA family (real TPU).

The 7-token AR action decode is weight-bound: each step streams the whole
LLM for one token. Jacobi decoding (llama.greedy_generate_jacobi) verifies
all 7 positions per multi-token forward — bit-identical tokens, weights
streamed once per ITERATION — so the latency ratio is
~(prefill + k * pass) / (prefill + 7 * pass) where k is the iteration
count at the fixed point.

CAVEAT recorded with the numbers: iteration count is WEIGHT-dependent.
Random-init weights give an arbitrary k (their greedy chain is noise);
trained VLAs are expected to converge fast (action dims are near-
independent given the image). This harness reports k alongside latency so
the preset table stays honest, and measures the k=1..6 latency ladder by
timing fixed-iteration sweeps (what a trained checkpoint would pay at its
own k).
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla import llama as llama_lib
    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.utils.monitor import timed_call

    rows = []
    for model_id, quant in [("random-7b", None), ("random-7b", "w8a8"),
                            ("random-7b", "w4a8"),
                            ("random-minivla", None)]:
        built = build_openvla(model_id, dtype=jnp.bfloat16,
                              quantization=quant,
                              memory_safe_quant_init=True)
        model, params, spec = built.model, built.params, built.spec
        built.params = None  # sole reference below: relayout must be able
        # to free each original q/k/v leaf as its transposed copy lands
        rng = np.random.RandomState(0)
        ids = np.ones((1, 32), np.int32)
        ids[:, 1:] = rng.randint(3, 1000, (1, 31))
        ids[:, -1] = 29871
        px = jnp.asarray(rng.randn(
            1, 6 if spec.use_fused_vision else 3,
            spec.siglip.image_size, spec.siglip.image_size), jnp.bfloat16)
        ids = jnp.asarray(ids)
        valid = jnp.ones_like(ids)

        ar = jax.jit(lambda p, i, x: model.predict_action_tokens_ragged(
            p, i, x, valid))
        t_ar, _, _ = timed_call(ar, params, ids, px, warmup=3, iters=15)
        toks_a = np.asarray(ar(params, ids, px))

        # bf16-7B: the Jacobi program compile-OOMs with natural-layout
        # q/k/v (XLA hoists 3 x 1 GB transposed copies); relayout the
        # stacked projections on device AFTER every AR use (the AR
        # program conversely OOMs when compiled for transposed args — the
        # layout follows the decode mode; llama.relayout_qkv_for_jacobi).
        params = llama_lib.relayout_qkv_for_jacobi(params)

        jac = jax.jit(lambda p, i, x: model.predict_action_tokens_jacobi(
            p, i, x, valid, return_iters=True))
        toks_j, iters = jac(params, ids, px)
        exact = bool((np.asarray(toks_j) == toks_a).all())
        t_jac, _, _ = timed_call(
            lambda p, i, x: jac(p, i, x)[0], params, ids, px,
            warmup=3, iters=15)

        row = {
            "model": model_id, "quant": quant or "bf16",
            "ar_ms": round(t_ar * 1000, 2),
            "jacobi_ms": round(t_jac * 1000, 2),
            "jacobi_iters": int(iters),
            "exact": exact,
        }

        # k-ladder: EXACTLY k sweeps per decode (num_iters=k static) — the
        # latency a trained checkpoint pays when its greedy chain converges
        # in k sweeps. k = n-1 (= action_dim - 1) is the lossless worst
        # case; random weights sit there, trained VLAs are expected at the
        # bottom rungs (see jacobi_convergence.py for the k-vs-coupling
        # map on controllable fake weights).
        n_new = spec.action_dim
        for k in range(1, n_new):
            jk = jax.jit(lambda p, i, x, k=k: model.predict_action_tokens_jacobi(
                p, i, x, valid, num_iters=k))
            t_k, _, _ = timed_call(jk, params, ids, px, warmup=3, iters=15)
            row[f"k{k}_ms"] = round(t_k * 1000, 2)
            print(f"  k={k}: {row[f'k{k}_ms']} ms", flush=True)

        rows.append(row)
        print(row, flush=True)
        del built, params

    out = REPO_ROOT / "docs/results/jacobi_decode_v5e.csv"
    import csv

    with out.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
