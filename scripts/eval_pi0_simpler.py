#!/usr/bin/env python3
"""Run BLURR Pi-0 evaluation in SimplerEnv (Bridge/Fractal tasks).

CLI parity with the reference scripts/eval_pi0_simpler.py: same flags, same
named presets, same log-dir layout runs/eval_bridge/<preset>_<seed>/
<task>_<timestamp>/run.log (the collectors regex-match the log output).

Preset semantics (reference :21-41):
  baseline/vanilla : no prefix KV cache, fp32, no compile-cache path, 10 steps
  prefix_cache     : prefix KV cache, fp32, 10 steps
  blurr/step1      : prefix KV cache, bf16, jit, 1 flow step
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from blurr_tpu.config.core import load_yaml
from blurr_tpu.paths import config_root, repo_root


def _apply_preset(cfg, preset: str) -> None:
    preset = preset.lower().strip()
    cfg["use_prefix_kv_cache"] = cfg.get("use_prefix_kv_cache", True)
    if preset in {"vanilla", "baseline"}:
        cfg["use_prefix_kv_cache"] = False
        cfg["use_bf16"] = False
        cfg["use_torch_compile"] = False
        cfg["num_inference_steps"] = 10
    elif preset in {"prefix_cache", "cached"}:
        cfg["use_prefix_kv_cache"] = True
        cfg["use_bf16"] = False
        cfg["use_torch_compile"] = False
        cfg["num_inference_steps"] = 10
    elif preset in {"blurr", "blurr_step1", "step1"}:
        cfg["use_prefix_kv_cache"] = True
        cfg["use_bf16"] = True
        cfg["use_torch_compile"] = True
        cfg["num_inference_steps"] = 1
    else:
        raise ValueError(f"Unknown preset: {preset}")


def _default_log_dir(*, preset: str | None, task: str, seed: int) -> Path:
    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    name = preset or "custom"
    return repo_root() / "runs" / "eval_bridge" / f"{name}_{seed}" / f"{task}_{stamp}"


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Run BLURR Pi0 evaluation in SimplerEnv (Bridge/Fractal tasks)."
    )
    parser.add_argument(
        "--config",
        type=str,
        default="config/eval/bridge.yaml",
        help="Eval config path, absolute or relative to the blurr_tpu package.",
    )
    parser.add_argument(
        "--preset",
        type=str,
        default="blurr",
        choices=["baseline", "vanilla", "prefix_cache", "blurr", "blurr_step1", "step1"],
        help="Named preset for toggles (prefix KV cache / BF16 / compile / steps).",
    )
    parser.add_argument("--task", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--gpu-id", type=int, default=0)  # parity; TPU ignores
    parser.add_argument("--n-eval-episode", type=int, default=240)
    parser.add_argument("--n-video", type=int, default=0)
    parser.add_argument(
        "--log-dir",
        type=str,
        default="",
        help="Override output directory. Default: runs/eval_bridge/<preset>_<seed>/<task>_<timestamp>/",
    )
    # manual overrides (optional; preset applies first)
    parser.add_argument("--use-bf16", action="store_true")
    parser.add_argument("--no-torch-compile", action="store_true")
    parser.add_argument("--num-inference-steps", type=int, default=0)
    parser.add_argument("--act-steps", type=int, default=0)
    parser.add_argument("--no-prefix-kv-cache", action="store_true")
    return parser.parse_args()


def main() -> None:
    args = parse_args()

    cfg_path = Path(args.config)
    if not cfg_path.is_absolute():
        local = Path(args.config)
        cfg_path = local if local.exists() else config_root().parent / args.config
    cfg = load_yaml(cfg_path)
    _apply_preset(cfg, args.preset)

    log_dir = (
        Path(args.log_dir).expanduser()
        if args.log_dir
        else _default_log_dir(preset=args.preset, task=args.task, seed=args.seed)
    )
    log_dir.mkdir(parents=True, exist_ok=True)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        handlers=[
            logging.FileHandler(log_dir / "run.log"),
            logging.StreamHandler(sys.stdout),
        ],
        force=True,
    )

    cfg["env"]["task"] = args.task
    cfg["checkpoint_path"] = str(Path(args.checkpoint).expanduser())
    cfg["seed"] = args.seed
    cfg["gpu_id"] = args.gpu_id
    cfg["n_eval_episode"] = args.n_eval_episode
    cfg["n_video"] = args.n_video
    cfg["log_dir"] = str(log_dir)
    cfg["use_prefix_kv_cache"] = cfg.get("use_prefix_kv_cache", True)
    if args.use_bf16:
        cfg["use_bf16"] = True
    if args.no_torch_compile:
        cfg["use_torch_compile"] = False
    if args.num_inference_steps > 0:
        cfg["num_inference_steps"] = args.num_inference_steps
    if args.act_steps > 0:
        cfg["act_steps"] = args.act_steps
    if args.no_prefix_kv_cache:
        cfg["use_prefix_kv_cache"] = False

    from blurr_tpu.agent.eval_agent import EvalAgent

    agent = EvalAgent(cfg)
    agent.run()

    print(f"\nDone. Logs written to: {log_dir}\n")


if __name__ == "__main__":
    main()
