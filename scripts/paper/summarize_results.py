#!/usr/bin/env python3
"""Turn microbench CSV/JSON outputs into LaTeX tables (parity surface:
reference scripts/paper/summarize_results.py — same subcommands and table
shapes, consuming the CSVs written by pi0_microbench.py / hf_microbench.py /
horizon_sweep_simpler.py)."""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path
from statistics import mean
from typing import Any, Dict, List, Optional


def _read_csv(path: Path) -> List[Dict[str, str]]:
    with path.open("r", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def _fmt(x: Any, digits: int = 2) -> str:
    try:
        if x is None or x == "":
            return "--"
        return f"{float(x):.{digits}f}"
    except Exception:
        return "--"


def _latex_table(rows: List[List[str]], *, headers: List[str], caption: str,
                 label: str) -> str:
    colspec = "l" + "c" * (len(headers) - 1)
    out = [
        r"\begin{table}[t]",
        r"\centering",
        rf"\caption{{{caption}}}",
        rf"\label{{{label}}}",
        rf"\begin{{tabular}}{{{colspec}}}",
        r"\toprule",
        " & ".join(headers) + r" \\",
        r"\midrule",
    ]
    out += [" & ".join(r) + r" \\" for r in rows]
    out += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    return "\n".join(out)


def summarize_prompt_sweep(path: Path) -> str:
    by_len: Dict[int, Dict[bool, Dict]] = {}
    for row in _read_csv(path):
        k = int(row["target_text_tokens"])
        by_len.setdefault(k, {})[row["use_prefix_kv_cache"].lower() == "true"] = row
    rows = []
    for k in sorted(by_len):
        no_c, yes_c = by_len[k].get(False), by_len[k].get(True)
        lat0 = float(no_c["latency_ms"]) if no_c and no_c["latency_ms"] else None
        lat1 = float(yes_c["latency_ms"]) if yes_c and yes_c["latency_ms"] else None
        speedup = lat0 / lat1 if (lat0 and lat1) else None
        rows.append([
            str(k), _fmt(lat0, 1), _fmt(lat1, 1),
            (_fmt(speedup, 2) + r"$\times$") if speedup is not None else "--",
        ])
    return _latex_table(
        rows,
        headers=["Text tokens", "No cache (ms)", "KV cache (ms)", "Speedup"],
        caption=(
            "Prompt-length scaling on Pi-0 microbench (same image, "
            "$\\mathrm{steps}=10$). Prefix KV caching reduces prompt-dependent "
            "recomputation."
        ),
        label="tab:prompt-sweep",
    )


def summarize_first_vs_steady(path: Path) -> str:
    rows = [
        [
            row["preset"].replace("_", r"\_"),  # LaTeX-safe preset aliases
            row["dtype"].replace("_", r"\_"),
            "Y" if row["torch_compile"].lower() == "true" else "N",
            _fmt(row.get("first_call_ms"), 1),
            _fmt(row.get("steady_latency_ms"), 1),
        ]
        for row in _read_csv(path)
    ]
    return _latex_table(
        rows,
        headers=["Preset", "Dtype", "Compile", "First (ms)", "Steady (ms)"],
        caption=(
            "First-call vs. steady-state latency (first call includes "
            "compile/warmup overhead when enabled)."
        ),
        label="tab:first-vs-steady",
    )


def summarize_horizon_sweep(path: Path) -> str:
    by_steps: Dict[int, List[float]] = {}
    for row in _read_csv(path):
        by_steps.setdefault(int(row["steps"]), []).append(float(row["success_rate"]))
    rows = [[str(s), _fmt(mean(v), 2)] for s, v in sorted(by_steps.items())]
    return _latex_table(
        rows,
        headers=["Steps", "Avg. success"],
        caption=(
            "Closed-loop success vs. flow steps (average over tasks; higher "
            "steps increase compute)."
        ),
        label="tab:horizon-sweep",
    )


def summarize_steps_tradeoff(*, horizon_csv: Path, steps_latency_csv: Path) -> str:
    by_steps: Dict[int, List[float]] = {}
    for row in _read_csv(horizon_csv):
        by_steps.setdefault(int(row["steps"]), []).append(float(row["success_rate"]))
    lat_by_steps = {int(r["steps"]): r for r in _read_csv(steps_latency_csv)}
    rows = []
    for steps in sorted(by_steps):
        lat = lat_by_steps.get(steps, {})
        rows.append([
            str(steps), _fmt(lat.get("latency_ms"), 1),
            _fmt(lat.get("peak_reserved_gb"), 2), _fmt(mean(by_steps[steps]), 2),
        ])
    return _latex_table(
        rows,
        headers=["Steps", "Latency (ms)", "HBM (GB)", "Avg. success"],
        caption=(
            "Trade-off between flow steps and performance. Latency/HBM are "
            "microbench numbers; success is averaged over SimplerEnv tasks."
        ),
        label="tab:steps-tradeoff",
    )


def summarize_hf_microbench(path: Path) -> str:
    data = _read_csv(path)
    grouped: Dict[str, Dict[str, Dict]] = {}
    for row in data:
        grouped.setdefault(row["model_id"], {})[row["profile"]] = row
    rows = []
    for model_id in sorted(grouped):
        base = grouped[model_id].get("fp32_eager") or grouped[model_id].get("bf16_eager")
        fast = grouped[model_id].get("bf16_compile") or grouped[model_id].get("fp16_compile")
        lat0 = float(base["latency_ms"]) if base and base.get("latency_ms") else None
        lat1 = float(fast["latency_ms"]) if fast and fast.get("latency_ms") else None
        speedup = lat0 / lat1 if (lat0 and lat1) else None
        rows.append([
            model_id.replace("_", r"\_"), _fmt(lat0, 1), _fmt(lat1, 1),
            (_fmt(speedup, 2) + r"$\times$") if speedup is not None else "--",
            _fmt((fast or base or {}).get("peak_reserved_gb"), 2),
        ])
    return _latex_table(
        rows,
        headers=["Model", "Base (ms)", "BLURR (ms)", "Speedup", "HBM (GB)"],
        caption="OpenVLA-family predict\\_action latency under BLURR profiles.",
        label="tab:hf-microbench",
    )


def summarize_cross_hardware(paths: List[Path]) -> str:
    """compare-presets JSONs from different chips -> one table."""
    rows = []
    for p in paths:
        payload = json.loads(p.read_text())
        lat = {r["preset"]: r.get("latency_ms") for r in payload.get("rows", [])}
        rows.append([
            str(payload.get("gpu", p.stem)).replace("_", r"\_"),
            _fmt(lat.get("baseline"), 1), _fmt(lat.get("blurr"), 1),
            _fmt(payload.get("speedup"), 2) + r"$\times$"
            if payload.get("speedup") else "--",
        ])
    return _latex_table(
        rows,
        headers=["Hardware", "Baseline (ms)", "BLURR (ms)", "Speedup"],
        caption="Cross-hardware Pi-0 latency (baseline vs. BLURR preset).",
        label="tab:cross-hardware",
    )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prompt-sweep")
    p.add_argument("--csv", type=Path, required=True)
    p.set_defaults(fn=lambda a: summarize_prompt_sweep(a.csv))

    p = sub.add_parser("first-vs-steady")
    p.add_argument("--csv", type=Path, required=True)
    p.set_defaults(fn=lambda a: summarize_first_vs_steady(a.csv))

    p = sub.add_parser("horizon-sweep")
    p.add_argument("--csv", type=Path, required=True)
    p.set_defaults(fn=lambda a: summarize_horizon_sweep(a.csv))

    p = sub.add_parser("steps-tradeoff")
    p.add_argument("--horizon-csv", type=Path, required=True)
    p.add_argument("--steps-latency-csv", type=Path, required=True)
    p.set_defaults(
        fn=lambda a: summarize_steps_tradeoff(
            horizon_csv=a.horizon_csv, steps_latency_csv=a.steps_latency_csv
        )
    )

    p = sub.add_parser("hf-microbench")
    p.add_argument("--csv", type=Path, required=True)
    p.set_defaults(fn=lambda a: summarize_hf_microbench(a.csv))

    p = sub.add_parser("cross-hardware")
    p.add_argument("--json", type=Path, nargs="+", required=True)
    p.set_defaults(fn=lambda a: summarize_cross_hardware(a.json))

    args = parser.parse_args()
    print(args.fn(args))


if __name__ == "__main__":
    main()
