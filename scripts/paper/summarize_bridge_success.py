#!/usr/bin/env python3
"""Summarize SimplerEnv Bridge summary.json files into a LaTeX/Markdown table
(output contract: reference scripts/paper/summarize_bridge_success.py:18-128 —
same fixed 4-task column order, header names, label inference, CLI flags, and
cell formatting, byte-for-byte; pinned by
tests/test_reference_parity_collectors.py)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

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
        if isinstance(preset, str) and preset.strip():
            return f"{model_id} ({preset})"
        return model_id
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
    episodes_str = str(int(episodes)) if isinstance(episodes, (int, float)) else "--"
    per_task = payload.get("per_task_success", {}) or {}
    avg = payload.get("avg_success")
    cells = [label, episodes_str]
    cells += [_fmt(per_task.get(task)) for task, _ in TASK_ORDER]
    cells.append(_fmt(avg))
    return cells


def _latex_table(rows, headers, caption, label):
    colspec = "l" + "c" * (len(headers) - 1)
    lines = [
        r"\begin{table}[t]",
        r"\centering",
        rf"\caption{{{caption}}}",
        rf"\label{{{label}}}",
        rf"\begin{{tabular}}{{{colspec}}}",
        r"\toprule",
        " & ".join(headers) + r" \\",
        r"\midrule",
    ]
    lines += [" & ".join(r) + r" \\" for r in rows]
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    return "\n".join(lines)


def _markdown_table(rows, headers):
    lines = ["| " + " | ".join(headers) + " |"]
    lines.append("| " + " | ".join(["---"] * len(headers)) + " |")
    lines += ["| " + " | ".join(r) + " |" for r in rows]
    return "\n".join(lines)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("summary", type=str, nargs="+")
    parser.add_argument("--format", type=str, default="latex", choices=["latex", "md"])
    parser.add_argument(
        "--caption",
        type=str,
        default="Bridge task success rates on SimplerEnv (higher is better).",
    )
    parser.add_argument("--label", type=str, default="tab:bridge-success-crossmodel")
    parser.add_argument(
        "--label-override", type=str, nargs="*", default=[],
        help="Optional per-summary label override (same length as summary list).",
    )
    args = parser.parse_args()

    paths = [Path(p).expanduser().resolve() for p in args.summary]
    overrides: List[Optional[str]] = list(args.label_override)
    if overrides and len(overrides) != len(paths):
        raise SystemExit(
            "--label-override must be the same length as summary paths (or omitted)."
        )
    overrides = overrides + [None] * (len(paths) - len(overrides))

    headers = ["Model", "Eps/task"] + [short for _, short in TASK_ORDER] + ["Avg."]
    rows = []
    for path, override in zip(paths, overrides):
        payload = json.loads(path.read_text(encoding="utf-8"))
        rows.append(_row(payload, override or _infer_label(payload, path)))

    if args.format == "md":
        print(_markdown_table(rows, headers))
    else:
        print(_latex_table(rows, headers, caption=args.caption, label=args.label))


if __name__ == "__main__":
    main()
