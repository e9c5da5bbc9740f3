#!/usr/bin/env python3
"""Success-vs-flow-steps sweep: orchestrates eval_pi0_simpler.py runs over a
grid of (num_inference_steps x task) and scrapes each run.log into one CSV
with columns (steps, task, episodes, success_rate, log_dir)."""

from __future__ import annotations

import argparse
import csv
import os
import re
import subprocess
import sys
from pathlib import Path

EVAL_SCRIPT = Path(__file__).resolve().parents[1] / "eval_pi0_simpler.py"

LOG_PATTERNS = {
    "success_rate": (re.compile(r"Success rate:\s*([0-9.]+)"), float),
    "episodes": (re.compile(r"Number of episodes:\s*([0-9]+)"), int),
}

BRIDGE_TASKS = [
    "widowx_spoon_on_towel",
    "widowx_carrot_on_plate",
    "widowx_stack_cube",
    "widowx_put_eggplant_in_basket",
]


def scrape_log(run_log: Path) -> dict:
    found = {k: None for k in LOG_PATTERNS}
    for line in run_log.read_text(encoding="utf-8", errors="ignore").splitlines():
        for key, (pattern, cast) in LOG_PATTERNS.items():
            if m := pattern.search(line):
                found[key] = cast(m.group(1))
    return found


def launch(args, steps: int, task: str, log_dir: Path) -> None:
    cmd = [
        sys.executable, "-u", str(EVAL_SCRIPT),
        "--task", task,
        "--checkpoint", args.checkpoint,
        "--config", args.config,
        "--preset", args.preset,
        "--seed", str(args.seed),
        "--gpu-id", str(args.gpu_id),
        "--n-eval-episode", str(args.episodes),
        "--n-video", "0",
        "--num-inference-steps", str(steps),
        "--log-dir", str(log_dir),
    ]
    if args.disable_torch_compile:
        cmd.append("--no-torch-compile")
    print("\n==> Running:", " ".join(cmd))
    subprocess.run(cmd, check=True, env=os.environ.copy())


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--out-root", type=str, required=True)
    parser.add_argument("--out-csv", type=str, required=True)
    parser.add_argument("--config", type=str, default="config/eval/bridge.yaml")
    parser.add_argument("--preset", type=str, default="blurr")
    parser.add_argument("--steps", type=int, nargs="+", default=[1, 2, 4, 6, 10])
    parser.add_argument("--tasks", type=str, nargs="*", default=BRIDGE_TASKS)
    parser.add_argument("--episodes", type=int, default=25)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--gpu-id", type=int, default=0)
    parser.add_argument("--disable-torch-compile", action="store_true")
    args = parser.parse_args()

    out_root = Path(args.out_root).expanduser().resolve()
    out_csv = Path(args.out_csv).expanduser().resolve()
    out_csv.parent.mkdir(parents=True, exist_ok=True)

    # write the CSV INCREMENTALLY: the grid is hours of SimplerEnv episodes,
    # and a single failed run must not discard every completed eval's row
    with out_csv.open("w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(
            f, fieldnames=["steps", "task", "episodes", "success_rate", "log_dir"]
        )
        writer.writeheader()
        f.flush()
        for steps in args.steps:
            for task in args.tasks:
                log_dir = out_root / f"steps{steps}" / task
                log_dir.mkdir(parents=True, exist_ok=True)
                launch(args, steps, task, log_dir)
                scraped = scrape_log(log_dir / "run.log")
                if scraped["success_rate"] is None:
                    raise RuntimeError(
                        f"Failed to parse success rate from {log_dir}"
                    )
                writer.writerow(
                    dict(steps=steps, task=task, episodes=scraped["episodes"],
                         success_rate=scraped["success_rate"],
                         log_dir=str(log_dir))
                )
                f.flush()
    print(f"\nWrote: {out_csv}\n")


if __name__ == "__main__":
    main()
