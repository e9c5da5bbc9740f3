#!/usr/bin/env python3
"""Pi-0 paper microbenchmarks (parity surface: reference
scripts/paper/pi0_microbench.py, 4 subcommands with the same CSV/JSON
schemas):

  prompt-sweep     text-token count vs latency, KV cache on/off
  first-vs-steady  first-call (compile) vs steady-state latency per preset
  steps-sweep      flow steps vs latency/HBM/GFLOPS
  compare-presets  baseline vs blurr JSON with speedup field
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Sequence

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _write_csv(path: Path, rows: Sequence[Dict[str, Any]]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        raise ValueError("No rows to write.")
    with path.open("w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def _write_json(path: Path, payload: Dict[str, Any]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2, sort_keys=True)


def _dtype_name(dtype) -> str:
    import jax.numpy as jnp

    return "bfloat16" if dtype == jnp.bfloat16 else "float32"


def cmd_prompt_sweep(args: argparse.Namespace) -> None:
    import blurr_tpu.benchmarks as B

    out_csv = Path(args.out_csv).expanduser().resolve()
    dtype = B.select_dtype(args.use_bf16, args.use_fp16)
    cfg = B.load_cfg(args.config)
    if args.num_inference_steps > 0:
        cfg["num_inference_steps"] = int(args.num_inference_steps)
    model, params = B.load_model(cfg, args.checkpoint, dtype)
    processor = B.build_processor(cfg)

    rows: List[Dict[str, Any]] = []
    for target_text_tokens in args.text_tokens:
        prompt = " ".join([args.token] * int(target_text_tokens))
        inputs = B.prepare_inputs(
            cfg, prompt, args.image, dtype, args.proprio_mode, processor
        )
        n_img = cfg["vision"]["config"]["num_image_tokens"]
        ids = np.asarray(inputs["input_ids"])
        am = np.asarray(inputs["attention_mask"])
        actual_non_image = int(
            ((ids != cfg["image_token_index"]) & (ids != cfg["pad_token_id"])).sum()
        )
        total_tokens = int(am.sum())
        for use_prefix_kv_cache in (False, True):
            result = B.bench(
                model, params, inputs,
                use_prefix_kv_cache=use_prefix_kv_cache,
                warmup=args.warmup, iters=args.iters, skip_flops=args.skip_flops,
            )
            rows.append(
                {
                    "gpu": B.device_name(),
                    "checkpoint": str(Path(args.checkpoint).expanduser()),
                    "config": str(Path(args.config)),
                    "dtype": _dtype_name(dtype),
                    "torch_compile": True,
                    "num_inference_steps": int(cfg["num_inference_steps"]),
                    "max_seq_len": int(cfg["max_seq_len"]),
                    "target_text_tokens": int(target_text_tokens),
                    "actual_non_image_tokens": actual_non_image,
                    "total_tokens(attn_mask_sum)": total_tokens,
                    "use_prefix_kv_cache": bool(use_prefix_kv_cache),
                    "latency_ms": round(result.latency_ms, 4),
                    "peak_reserved_gb": round(result.peak_reserved_gb, 4),
                    "gflops": None if result.gflops is None else round(result.gflops, 4),
                    "note": result.flops_note or "",
                }
            )
    _write_csv(out_csv, rows)
    print(f"Wrote: {out_csv}")


def cmd_first_vs_steady(args: argparse.Namespace) -> None:
    import blurr_tpu.benchmarks as B

    out_csv = Path(args.out_csv).expanduser().resolve()
    rows: List[Dict[str, Any]] = []
    for preset_name in args.presets:
        preset = B.preset_toggles(preset_name)
        dtype = B.select_dtype(preset["use_bf16"], preset["use_fp16"])
        cfg = B.load_cfg(args.config)
        cfg["num_inference_steps"] = preset["num_inference_steps"]
        row = {
            "gpu": B.device_name(),
            "preset": preset_name,
            "dtype": _dtype_name(dtype),
            "torch_compile": bool(preset["use_torch_compile"]),
            "use_prefix_kv_cache": bool(preset["use_prefix_kv_cache"]),
            "num_inference_steps": int(cfg["num_inference_steps"]),
            "first_call_ms": None,
            "steady_latency_ms": None,
            # pre-initialize so DictWriter fieldnames (taken from rows[0])
            # include it even when the first preset succeeds
            "note": "",
        }
        def run_one():
            # function scope so a failure frees the params before the next
            # preset allocates (a leaked fp32 tree OOMs the following run)
            model, params = B.load_model(cfg, args.checkpoint, dtype)
            inputs = B.prepare_inputs(
                cfg, args.prompt, args.image, dtype, args.proprio_mode
            )
            first_s = B.first_call_seconds(
                model, params, inputs,
                use_prefix_kv_cache=preset["use_prefix_kv_cache"],
            )
            result = B.bench(
                model, params, inputs,
                use_prefix_kv_cache=preset["use_prefix_kv_cache"],
                warmup=args.warmup, iters=args.iters, skip_flops=True,
            )
            return first_s, result

        try:  # graceful OOM skip (fp32 3B exceeds 16GB HBM)
            first_s, result = run_one()
            row["first_call_ms"] = round(first_s * 1000.0, 3)
            row["steady_latency_ms"] = round(result.latency_ms, 3)
        except Exception as exc:
            row["note"] = f"skipped: {type(exc).__name__}: {str(exc)[:120]}"
        import gc

        gc.collect()
        rows.append(row)
    _write_csv(out_csv, rows)
    print(f"Wrote: {out_csv}")


def cmd_steps_sweep(args: argparse.Namespace) -> None:
    import blurr_tpu.benchmarks as B

    out_csv = Path(args.out_csv).expanduser().resolve()
    dtype = B.select_dtype(args.use_bf16, args.use_fp16)
    rows: List[Dict[str, Any]] = []
    cfg = B.load_cfg(args.config)
    model, params = B.load_model(cfg, args.checkpoint, dtype)
    inputs = B.prepare_inputs(cfg, args.prompt, args.image, dtype, args.proprio_mode)
    for steps in args.steps:
        model.cfg["num_inference_steps"] = int(steps)
        # static step count -> separate jit per sweep point
        import jax

        fn = (
            model.infer_action
            if not args.no_prefix_kv_cache
            else model.infer_action_naive
        )
        from blurr_tpu.utils.flops import pi0_forward_flops
        from blurr_tpu.utils.monitor import (
            compiled_hbm_gb,
            peak_tpu_memory_gb,
            timed_call,
        )

        call_args = (
            params,
            inputs["input_ids"],
            inputs["attention_mask"],
            inputs["pixel_values"],
            inputs["proprios"],
            inputs["noise"],
        )
        # AOT-compile so the exact per-program HBM footprint is reported
        # (memory_stats() is empty over the axon tunnel)
        step_fn = jax.jit(
            lambda p, i, a, x, pr, nz, s=int(steps): fn(
                p, i, a, x, pr, nz, num_inference_steps=s
            )
        ).lower(*call_args).compile()
        hbm = compiled_hbm_gb(step_fn)
        latency, _, _ = timed_call(
            step_fn, *call_args, warmup=args.warmup, iters=args.iters,
        )
        gflops = None
        if not args.skip_flops:
            cfg_steps = dict(cfg)
            cfg_steps["num_inference_steps"] = int(steps)
            gflops = (
                pi0_forward_flops(cfg_steps, use_cache=not args.no_prefix_kv_cache)
                / latency
                / 1e9
            )
        rows.append(
            {
                "gpu": B.device_name(),
                "steps": int(steps),
                "dtype": _dtype_name(dtype),
                "torch_compile": True,
                "use_prefix_kv_cache": bool(not args.no_prefix_kv_cache),
                "latency_ms": round(latency * 1000.0, 4),
                "peak_reserved_gb": round(hbm.get("peak_gb") or peak_tpu_memory_gb(), 4),
                "gflops": None if gflops is None else round(gflops, 4),
                "note": "",
            }
        )
    _write_csv(out_csv, rows)
    print(f"Wrote: {out_csv}")


def cmd_compare_presets(args: argparse.Namespace) -> None:
    import blurr_tpu.benchmarks as B

    out_json = Path(args.out_json).expanduser().resolve()
    results: Dict[str, Any] = {
        "gpu": B.device_name(),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "rows": [],
    }
    for preset_name in args.presets:
        preset = B.preset_toggles(preset_name)
        dtype = B.select_dtype(preset["use_bf16"], preset["use_fp16"])
        cfg = B.load_cfg(args.config)
        cfg["num_inference_steps"] = preset["num_inference_steps"]
        row = {
            "preset": preset_name,
            "dtype": _dtype_name(dtype),
            "torch_compile": bool(preset["use_torch_compile"]),
            "use_prefix_kv_cache": bool(preset["use_prefix_kv_cache"]),
            "num_inference_steps": int(cfg["num_inference_steps"]),
            "latency_ms": None,
            "peak_reserved_gb": None,
            "gflops": None,
            "note": "",
        }
        def run_one():
            model, params = B.load_model(cfg, args.checkpoint, dtype)
            inputs = B.prepare_inputs(
                cfg, args.prompt, args.image, dtype, args.proprio_mode
            )
            return B.bench(
                model, params, inputs,
                use_prefix_kv_cache=preset["use_prefix_kv_cache"],
                warmup=args.warmup, iters=args.iters, skip_flops=args.skip_flops,
            )

        try:  # graceful OOM skip (the reference's <40GB fp32 skip pattern)
            result = run_one()
            row.update(
                latency_ms=round(result.latency_ms, 4),
                peak_reserved_gb=round(result.peak_reserved_gb, 4),
                gflops=None if result.gflops is None else round(result.gflops, 4),
                note=result.flops_note or "",
            )
        except Exception as exc:
            row["note"] = f"skipped: {type(exc).__name__}: {str(exc)[:160]}"
        import gc

        gc.collect()
        results["rows"].append(row)
    if len(results["rows"]) == 2:
        a, b = results["rows"]
        if a.get("latency_ms") and b.get("latency_ms"):
            results["speedup"] = round(a["latency_ms"] / b["latency_ms"], 4)
    _write_json(out_json, results)
    print(f"Wrote: {out_json}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    def add_common_io(p):
        p.add_argument("--config", type=str, default="config/eval/bridge.yaml")
        p.add_argument("--checkpoint", type=str, required=True)
        p.add_argument("--image", type=str, default="")
        p.add_argument(
            "--prompt", type=str,
            default="In: What action should the robot take?\nOut:",
        )
        p.add_argument(
            "--proprio-mode", type=str, default="zeros", choices=["zeros", "random"]
        )
        p.add_argument("--warmup", type=int, default=5)
        p.add_argument("--iters", type=int, default=50)

    p_prompt = sub.add_parser("prompt-sweep", help="Sweep prompt length vs latency (KV cache on/off).")
    add_common_io(p_prompt)
    p_prompt.add_argument("--out-csv", type=str, required=True)
    p_prompt.add_argument("--text-tokens", type=int, nargs="+", required=True)
    p_prompt.add_argument("--token", type=str, default="move")
    p_prompt.add_argument("--num-inference-steps", type=int, default=10)
    p_prompt.add_argument("--use-bf16", action="store_true")
    p_prompt.add_argument("--use-fp16", action="store_true")
    p_prompt.add_argument("--use-torch-compile", action="store_true")
    p_prompt.add_argument("--skip-flops", action="store_true")
    p_prompt.set_defaults(func=cmd_prompt_sweep)

    p_fvs = sub.add_parser("first-vs-steady", help="Measure 1st call vs steady-state latency.")
    add_common_io(p_fvs)
    p_fvs.add_argument("--out-csv", type=str, required=True)
    p_fvs.add_argument("--presets", type=str, nargs="+", default=["baseline", "blurr"])
    p_fvs.set_defaults(func=cmd_first_vs_steady)

    p_steps = sub.add_parser("steps-sweep", help="Sweep num_inference_steps vs latency.")
    add_common_io(p_steps)
    p_steps.add_argument("--out-csv", type=str, required=True)
    p_steps.add_argument("--steps", type=int, nargs="+", required=True)
    p_steps.add_argument("--use-bf16", action="store_true")
    p_steps.add_argument("--use-fp16", action="store_true")
    p_steps.add_argument("--use-torch-compile", action="store_true")
    p_steps.add_argument("--no-prefix-kv-cache", action="store_true")
    p_steps.add_argument("--skip-flops", action="store_true")
    p_steps.set_defaults(func=cmd_steps_sweep)

    p_cmp = sub.add_parser("compare-presets", help="Benchmark named presets and write JSON.")
    add_common_io(p_cmp)
    p_cmp.add_argument("--out-json", type=str, required=True)
    p_cmp.add_argument("--presets", type=str, nargs="+", default=["baseline", "blurr"])
    p_cmp.add_argument("--skip-flops", action="store_true")
    p_cmp.set_defaults(func=cmd_compare_presets)
    return parser


def main() -> None:
    args = build_parser().parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
