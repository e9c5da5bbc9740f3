#!/usr/bin/env python3
"""Benchmark latency / HBM (and optional GFLOPS) for Pi-0 checkpoints.

CLI + output parity with reference scripts/benchmark_pi0.py; GFLOPS uses an
analytic FLOP count of one forward divided by steady latency (same
"effective throughput" definition as the reference's profiler-based count,
scripts/benchmark_pi0.py:297-299). `--checkpoint random` benches random-init
weights (no checkpoint needed for latency work).

Model/input loading lives in the shared harness (blurr_tpu/benchmarks.py,
also used by scripts/paper/pi0_microbench.py); this script adds the
batch-throughput / data-parallel / profiler-trace extensions.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Benchmark latency / HBM / GFLOPS for a PiZero checkpoint."
    )
    parser.add_argument(
        "--config",
        type=str,
        required=True,
        help="Pi0 config yaml (absolute, or relative to the blurr_tpu package).",
    )
    parser.add_argument(
        "--checkpoint",
        type=str,
        required=True,
        help="Path to the checkpoint (.pt), or 'random' for random init.",
    )
    parser.add_argument(
        "--prompt",
        type=str,
        default="In: What action should the robot take?\nOut:",
    )
    parser.add_argument(
        "--image",
        type=str,
        default="",
        help="RGB image path for visual context (synthetic if omitted/missing).",
    )
    parser.add_argument("--use-bf16", action="store_true")
    parser.add_argument("--use-fp16", action="store_true")
    parser.add_argument(
        "--use-torch-compile",
        action="store_true",
        help="Parity flag; maps to jax.jit (always enabled on TPU).",
    )
    parser.add_argument("--no-prefix-kv-cache", action="store_true")
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--skip-flops", action="store_true")
    parser.add_argument(
        "--proprio-mode", type=str, default="zeros", choices=["zeros", "random"]
    )
    parser.add_argument(
        "--batch-size", type=int, default=1,
        help="Throughput mode: replicate the control step over a batch "
        "(TPU extension; the reference benches batch 1 only).",
    )
    parser.add_argument(
        "--profile-dir", type=str, default="",
        help="Write a jax.profiler XLA trace of the timed loop here "
        "(no-op on backends without tracing).",
    )
    parser.add_argument(
        "--dp", type=int, default=1,
        help="Data-parallel shards over a ('data','model') mesh (needs "
        "batch-size divisible by dp and dp devices).",
    )
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from blurr_tpu import benchmarks as B
    from blurr_tpu.utils.flops import pi0_forward_flops
    from blurr_tpu.utils.monitor import (
        compiled_hbm_gb,
        peak_tpu_memory_gb,
        timed_call,
    )

    if args.use_bf16 and args.use_fp16:
        raise ValueError("Specify at most one of --use-bf16 or --use-fp16.")
    dtype = B.select_dtype(args.use_bf16, args.use_fp16)  # fp16 -> bf16 on TPU
    cfg = B.load_cfg(args.config)
    model, params = B.load_model(cfg, args.checkpoint, dtype)
    inputs = B.prepare_inputs(
        cfg, args.prompt, args.image, dtype, proprio_mode=args.proprio_mode
    )

    use_cache = not args.no_prefix_kv_cache
    fn = model.infer_action if use_cache else model.infer_action_naive
    jitted = jax.jit(fn)

    bsz = max(1, args.batch_size)

    def tile(x):
        return jnp.broadcast_to(x, (bsz, *x.shape[1:])) if bsz > 1 else x

    input_ids = tile(inputs["input_ids"])
    attention_mask = tile(inputs["attention_mask"])
    pixel_values = tile(inputs["pixel_values"])
    proprios = tile(inputs["proprios"])
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (bsz, cfg["horizon_steps"], cfg["action_dim"]), dtype
    )
    if args.dp > 1:
        from blurr_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params

        mesh = make_mesh(data=args.dp, model=1)
        params = shard_params(params, mesh)
        bsh = batch_sharding(mesh)
        input_ids, attention_mask, pixel_values, proprios, noise = (
            jax.device_put(x, bsh)
            for x in (input_ids, attention_mask, pixel_values, proprios, noise)
        )
    call_args = (
        params,
        input_ids,
        attention_mask,
        pixel_values,
        proprios,
        noise,
    )
    from blurr_tpu.utils.profiling import maybe_trace

    # AOT-compile so the exact per-program HBM footprint is available from
    # XLA's buffer assignment (memory_stats() is empty over the axon tunnel)
    step = jitted.lower(*call_args).compile()
    hbm = compiled_hbm_gb(step)
    with maybe_trace(args.profile_dir):
        avg_latency, _, _ = timed_call(
            step, *call_args, warmup=args.warmup, iters=args.iters
        )
    peak_mem = hbm.get("peak_gb") or peak_tpu_memory_gb()

    gflops = None
    if not args.skip_flops:
        total_flops = pi0_forward_flops(cfg, use_cache=use_cache, batch=bsz)
        gflops = (total_flops / avg_latency) / 1e9

    dtype_name = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    print("========== Benchmark Summary ==========")
    print(f"Checkpoint: {args.checkpoint}")
    print(f"Config: {args.config}")
    print(f"Prompt: {args.prompt}")
    print(f"Image: {Path(args.image).resolve() if args.image else '(synthetic)'}")
    print(f"Device: {jax.devices()[0]}")
    print(f"Dtype: jax.{dtype_name}")
    print(f"bfloat16: {dtype == jnp.bfloat16}")
    print(f"torch.compile: {True}")  # jax.jit always on
    print(f"prefix KV cache: {use_cache}")
    print(f"Warmup iterations: {args.warmup}")
    print(f"Timed iterations: {args.iters}")
    print(f"Average latency: {avg_latency * 1000:.2f} ms")
    if bsz > 1:
        print(f"Batch size: {bsz} (dp={args.dp})")
        print(f"Throughput: {bsz / avg_latency:.1f} action-chunks/s")
    print(f"Peak reserved TPU memory: {peak_mem:.2f} GB")
    if gflops is not None:
        print(f"Approximate GFLOPS: {gflops:,.2f}")
    else:
        print("GFLOPS skipped (--skip-flops).")
    print("=======================================")


if __name__ == "__main__":
    main()
