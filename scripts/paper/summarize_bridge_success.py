#!/usr/bin/env python3
"""Summarize SimplerEnv Bridge summary.json files into a LaTeX/Markdown table
(parity surface: reference scripts/paper/summarize_bridge_success.py — same
fixed 4-task column order and label inference)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List

TASK_ORDER = [
    ("widowx_carrot_on_plate", "Carrot"),
    ("widowx_spoon_on_towel", "Spoon"),
    ("widowx_stack_cube", "Blocks"),
    ("widowx_put_eggplant_in_basket", "Eggplant"),
]


def _fmt(x: Any, digits: int = 2) -> str:
    try:
        return f"{float(x):.{digits}f}"
    except Exception:
        return "--"


def _infer_label(payload: Dict[str, Any], path: Path) -> str:
    model_id = payload.get("model_id")
    if isinstance(model_id, str) and model_id.strip():
        preset = payload.get("preset")
        return f"{model_id} ({preset})" if preset else model_id
    ckpt = payload.get("checkpoint")
    if isinstance(ckpt, str) and ckpt.strip():
        if "minivla" in ckpt.lower():
            return "MiniVLA (prismatic)"
        return Path(ckpt).name
    return path.parent.name


def _row(payload: Dict[str, Any], label: str) -> List[str]:
    episodes = (
        payload.get("episodes_per_task")
        or payload.get("n_eval_episode")
        or payload.get("episodes")
    )
    per_task = payload.get("per_task_success", {}) or {}
    avg = payload.get("avg_success")
    cells = [label, str(int(episodes)) if episodes is not None else "--"]
    cells += [_fmt(per_task.get(task)) for task, _ in TASK_ORDER]
    cells.append(_fmt(avg))
    return cells


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("summaries", type=Path, nargs="+")
    parser.add_argument("--format", choices=["latex", "markdown"], default="latex")
    parser.add_argument("--label", type=str, nargs="*", default=[])
    args = parser.parse_args()

    headers = ["Model", "Episodes"] + [n for _, n in TASK_ORDER] + ["Avg"]
    rows = []
    for i, path in enumerate(args.summaries):
        payload = json.loads(path.read_text(encoding="utf-8"))
        label = args.label[i] if i < len(args.label) else _infer_label(payload, path)
        rows.append(_row(payload, label))

    if args.format == "markdown":
        print("| " + " | ".join(headers) + " |")
        print("|" + "---|" * len(headers))
        for r in rows:
            print("| " + " | ".join(r) + " |")
    else:
        colspec = "l" + "c" * (len(headers) - 1)
        print(r"\begin{tabular}{" + colspec + "}")
        print(r"\toprule")
        print(" & ".join(headers) + r" \\")
        print(r"\midrule")
        for r in rows:
            print(" & ".join(c.replace("_", r"\_") for c in r) + r" \\")
        print(r"\bottomrule")
        print(r"\end{tabular}")


if __name__ == "__main__":
    main()
