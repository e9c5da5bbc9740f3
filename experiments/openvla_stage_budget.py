#!/usr/bin/env python3
"""Stage budget for the OpenVLA-7B Jacobi k=1 step: where does the
~22 ms intercept (total minus one sweep) go?

Decomposition measured as standalone jitted programs on the same weights:
  vision   = _build_prompt_embeds (DINOv2-L + SigLIP-400M bf16 + projector
             + embed concat)
  total    = predict_action_tokens_jacobi at num_iters=1
  sweep    = slope from the k-ladder (jacobi_decode_v5e.csv)
  prefill+head ~= total - sweep - vision

Motivation: the LLM quantizes (w8a8/w4a8) but the vision towers stay
bf16 — if vision is a large slice of the intercept, quantizing the ViTs
is the next lever; if it is a few ms, the intercept is prefill
compute and the current design is at its floor.
"""

import sys
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

    for model_id, quant in [("random-7b", "w4a8"), ("random-7b", None)]:
        built = build_openvla(model_id, dtype=jnp.bfloat16,
                              quantization=quant,
                              memory_safe_quant_init=True)
        model, params, spec = built.model, built.params, built.spec
        built.params = None
        if quant is None:
            params = llama_lib.relayout_qkv_for_jacobi(params)
        rng = np.random.RandomState(0)
        ids = np.ones((1, 32), np.int32)
        ids[:, 1:] = rng.randint(3, 1000, (1, 31))
        ids[:, -1] = 29871
        px = jnp.asarray(rng.randn(
            1, 6 if spec.use_fused_vision else 3,
            spec.siglip.image_size, spec.siglip.image_size), jnp.bfloat16)
        ids = jnp.asarray(ids)
        valid = jnp.ones_like(ids)

        vis = jax.jit(model._build_prompt_embeds)
        t_vis, _, _ = timed_call(vis, params, ids, px, warmup=3, iters=20)

        k1 = jax.jit(lambda p, i, x: model.predict_action_tokens_jacobi(
            p, i, x, valid, num_iters=1))
        t_k1, _, _ = timed_call(k1, params, ids, px, warmup=3, iters=20)

        k2 = jax.jit(lambda p, i, x: model.predict_action_tokens_jacobi(
            p, i, x, valid, num_iters=2))
        t_k2, _, _ = timed_call(k2, params, ids, px, warmup=3, iters=20)

        sweep = t_k2 - t_k1
        print({
            "model": model_id, "quant": quant or "bf16",
            "vision_ms": round(t_vis * 1e3, 2),
            "k1_total_ms": round(t_k1 * 1e3, 2),
            "sweep_ms": round(sweep * 1e3, 2),
            "prefill_head_ms": round((t_k1 - sweep - t_vis) * 1e3, 2),
        }, flush=True)
        del params
        jax.clear_caches()


if __name__ == "__main__":
    main()
