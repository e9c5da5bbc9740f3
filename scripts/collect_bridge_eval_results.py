#!/usr/bin/env python3
"""Scrape runs/eval_bridge/*/*/run.log into runs/bridge_eval_summary.csv.

Output-format parity with reference scripts/collect_bridge_eval_results.py:
same regexes ("Success rate:", "Number of episodes:"), same CSV columns
(model, task, success_rate, episodes, run_dir)."""

import csv
import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from blurr_tpu.paths import repo_root

SUCCESS_RE = re.compile(r"Success rate:\s*([0-9.]+)")
EPISODES_RE = re.compile(r"Number of episodes:\s*([0-9]+)")


def collect(runs_dir: Path):
    rows = []
    if not runs_dir.is_dir():
        print(f"Runs directory not found: {runs_dir}")
        return rows
    for model_dir in sorted(runs_dir.iterdir()):
        if not model_dir.is_dir():
            continue
        for run_dir in sorted(model_dir.iterdir()):
            run_log = run_dir / "run.log"
            if not run_dir.is_dir() or not run_log.is_file():
                continue
            # run dir name: <task>_<date>_<time> -> strip the two stamp parts.
            # NOTE (reference parity, collect_bridge_eval_results.py:38-42):
            # the >=4 guard is the reference's own; single-word task names
            # keep the stamp, and multi-task hf/prismatic run.logs in this
            # tree contribute one row with the LAST task's rate. Bridge task
            # names (widowx_*) always have >=3 underscores, so pi0 rows
            # aggregate correctly.
            parts = run_dir.name.split("_")
            task_name = "_".join(parts[:-2]) if len(parts) >= 4 else run_dir.name

            success = episodes = None
            with run_log.open("r", encoding="utf-8", errors="ignore") as f:
                for line in f:
                    if m := SUCCESS_RE.search(line):
                        success = float(m.group(1))
                    if m := EPISODES_RE.search(line):
                        episodes = int(m.group(1))
            if success is None:
                continue
            rows.append(
                {
                    "model": model_dir.name,
                    "task": task_name,
                    "success_rate": success,
                    "episodes": episodes,
                    "run_dir": str(run_dir),
                }
            )
    return rows


def main():
    root = repo_root()
    runs_dir = root / "runs" / "eval_bridge"
    out_csv = root / "runs" / "bridge_eval_summary.csv"
    rows = collect(runs_dir)
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with out_csv.open("w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(
            f, fieldnames=["model", "task", "success_rate", "episodes", "run_dir"]
        )
        writer.writeheader()
        writer.writerows(rows)
    print(f"Wrote {len(rows)} rows to {out_csv}")


if __name__ == "__main__":
    main()
