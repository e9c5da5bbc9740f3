#!/usr/bin/env python3
"""Headline benchmark: Pi-0 BLURR-preset control-step latency on one TPU chip.

Full bridge.yaml architecture (PaliGemma-3B-shape: 18-layer joint model,
2048/16384 Gemma mixture + 1024/4096 action expert, SigLIP-27L, 256 image
tokens + 276-token prefix), random-init BF16 weights, prefix-KV-cache path
with a single flow step (the reference's 'blurr' preset semantics,
scripts/eval_pi0_simpler.py:35-39).

Prints ONE JSON line (value = steady-state per-step device latency from the
fetch-fenced two-point scheme in utils.monitor.timed_call):
  {"metric": "pi0_blurr_action_step_ms", "value": <ms>, "unit": "ms",
   "vs_baseline": <17.1 / ms>}
vs_baseline > 1.0 means faster than the reference's published H100 17.1 ms
(README.md:231).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_BLURR_MS = 17.1  # BLURR-Pi-0 on H100, reference README.md:231


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from blurr_tpu.config.core import load_yaml
    from blurr_tpu.models.pi0.pizero import PiZero
    from blurr_tpu.paths import config_root
    from blurr_tpu.utils.monitor import (
        compiled_hbm_gb,
        peak_tpu_memory_gb,
        timed_call,
    )

    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    cfg["num_inference_steps"] = 1  # blurr preset
    cfg["use_bf16"] = True

    model = PiZero(cfg)
    t0 = time.time()
    if os.environ.get("BLURR_BENCH_REAL_INIT"):
        params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        # Deterministic iota-pattern weights: timing-identical to random init
        # on the MXU, but avoids ~150s of per-program remote RNG compiles on
        # the axon tunnel (keeps the whole bench well under driver timeouts).
        shapes = jax.eval_shape(
            lambda: model.init_params(jax.random.PRNGKey(0), jnp.bfloat16)
        )

        @jax.jit  # ONE device program for the whole tree (one remote compile)
        def make_all():
            pattern = (jnp.arange(128, dtype=jnp.float32) - 63.5) * (0.02 / 64)

            def mk(leaf):
                n = 1
                for d in leaf.shape:
                    n *= d
                rows = -(-n // 128)
                tiled = jnp.broadcast_to(pattern, (rows, 128)).reshape(-1)
                return tiled[:n].reshape(leaf.shape).astype(leaf.dtype)

            return jax.tree.map(mk, shapes)

        params = make_all()
    params = model.tie_action_proprio_weights(params)
    init_s = time.time() - t0

    rng = np.random.RandomState(0)
    bsz = 1
    seq = cfg["max_image_text_tokens"]
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    n_text = 10  # typical instruction length
    ids = np.zeros((bsz, seq), np.int32)
    am = np.zeros((bsz, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + n_text] = rng.randint(3, 1000, (bsz, n_text))
    am[:, : n_img + n_text] = 1
    img = cfg["vision"]["config"]["image_size"]
    args = (
        params,
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

    # AOT-compile once: the compiled program is both timed and inspected for
    # its exact HBM footprint (device.memory_stats() is empty on axon)
    step = jax.jit(model.infer_action).lower(*args).compile()
    hbm = compiled_hbm_gb(step)
    p50, mean, _ = timed_call(step, *args, warmup=5, iters=30)
    p50_ms = p50 * 1000

    result = {
        "metric": "pi0_blurr_action_step_ms",
        "value": round(p50_ms, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_BLURR_MS / p50_ms, 3),
    }

    # quantized/preset-ladder rider (verdict r2 #8 + r3 #8): the same
    # weights through the measured speed-ladder presets, as extra keys on
    # the single JSON line (the driver reads metric/value/unit/vs_baseline;
    # extra keys ride along). Each rung loads its SHIPPED preset yaml
    # verbatim (no overrides) so the JSON keys measure exactly the programs
    # the presets/docs describe — e.g. the pool64 presets disable KV int8,
    # which an override-based ladder silently re-enabled. Disable with
    # BLURR_BENCH_NO_LADDER=1 if the round is time-constrained.
    if not os.environ.get("BLURR_BENCH_NO_LADDER"):
        import gc

        def ladder(tag, yaml_name, fresh_weights=False):
            try:
                cfg_q = load_yaml(config_root() / "eval" / yaml_name)
                model_q = PiZero(cfg_q)
                if not fresh_weights:
                    base_q = params
                    args_in = args[1:]
                else:
                    # pool64 presets change the vision shapes (112 px -> 64
                    # pos-embed rows): fresh iota weights + fresh inputs
                    from experiments.bench_flash import make_inputs
                    from experiments.fastinit import fake_params

                    base_q = model_q.tie_action_proprio_weights(
                        fake_params(model_q, jnp.bfloat16))
                    args_in = make_inputs(cfg_q)
                params_q = model_q.enable_vlm_quantization(
                    model_q.enable_action_quantization(base_q)
                )
                args_q = (params_q,) + tuple(args_in)
                del base_q
                step_q = jax.jit(model_q.infer_action).lower(*args_q).compile()
                q50, _, _ = timed_call(step_q, *args_q, warmup=5, iters=30)
                result[f"{tag}_ms"] = round(q50 * 1000, 3)
                result[f"{tag}_vs_baseline"] = round(
                    REFERENCE_BLURR_MS / (q50 * 1000), 3)
                del params_q, args_q, step_q
            except Exception as exc:  # the headline number must still print
                print(f"# {tag} ladder failed: {exc}", file=sys.stderr)
            gc.collect()

        ladder("w8a8", "bridge_w8a8_steps1.yaml")
        # the pool64 entries build their own (112 px vision) weight trees:
        # drop the 6.6 GB base tree first or three trees OOM the chip
        params = args = step = None
        gc.collect()
        ladder("pool64_w8a8", "bridge_pool64_w8a8_steps1.yaml",
               fresh_weights=True)
        ladder("pool64_w4a8", "bridge_pool64_w4a8_steps1.yaml",
               fresh_weights=True)

    print(json.dumps(result))
    peak = hbm.get("peak_gb") or peak_tpu_memory_gb()
    print(
        f"# mean={mean*1000:.2f} ms, hz={1.0/p50:.1f}, init={init_s:.1f}s, "
        f"peak_hbm={peak:.2f} GB (args={hbm.get('argument_gb', 0):.2f} "
        f"out={hbm.get('output_gb', 0):.3f} temp={hbm.get('temp_gb', 0):.2f})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
