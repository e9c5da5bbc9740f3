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
    # reference semantics (summarize_results.py:25-36): None/empty/'none' ->
    # '--'; unparseable values pass through as text
    if x is None:
        return "--"
    try:
        if isinstance(x, str):
            s = x.strip()
            if s == "" or s.lower() == "none":
                return "--"
            return f"{float(s):.{digits}f}"
        return f"{float(x):.{digits}f}"
    except Exception:
        return str(x)


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
        # reference caption modulo the single VRAM->HBM terminology swap
        caption=(
            "Trade-off between flow steps and performance. Latency/HBM are "
            "microbench numbers; success is averaged over tasks in SimplerEnv."
        ),
        label="tab:steps-tradeoff",
    )


def summarize_hf_microbench(path: Path) -> str:
    """Reference contract (summarize_results.py:171-242): ONE globally chosen
    eager profile and ONE compile profile (first present, in the reference's
    preference order) for every model, dynamic dtype-derived column labels,
    and a hardware note when all rows share one chip."""
    data = _read_csv(path)
    gpus = sorted({row.get("gpu", "").strip() for row in data if row.get("gpu")})
    gpu_note = f" (GPU: {gpus[0].replace('_', r'\\_')})" if len(gpus) == 1 else ""
    grouped: Dict[str, Dict[str, Dict]] = {}
    for row in data:
        grouped.setdefault(row["model_id"], {})[row["profile"]] = row

    def _first_present_profile(candidates: List[str]) -> Optional[str]:
        for name in candidates:
            for model_rows in grouped.values():
                row = model_rows.get(name)
                if row and row.get("latency_ms") not in (None, "", "None"):
                    return name
        return None

    base_profile = _first_present_profile(["fp32_eager", "bf16_eager", "fp16_eager"])
    comp_profile = _first_present_profile(["bf16_compile", "fp16_compile"])
    if base_profile is None or comp_profile is None:
        raise ValueError(
            "HF microbench CSV missing required profiles. "
            "Need an eager profile (fp32_eager/bf16_eager/fp16_eager) and a "
            "compile profile (bf16_compile/fp16_compile)."
        )

    def _label_from_row(profile: str) -> str:
        for model_rows in grouped.values():
            row = model_rows.get(profile)
            if not row or row.get("latency_ms") in (None, "", "None"):
                continue
            dtype = (row.get("dtype") or "").upper()
            if (row.get("torch_compile") or "").lower() == "true":
                return f"{dtype}+compile (ms)" if dtype else "Compile (ms)"
            return f"{dtype} eager (ms)" if dtype else "Eager (ms)"
        return profile

    rows = []
    for model_id in sorted(grouped):
        a = grouped[model_id].get(base_profile)
        b = grouped[model_id].get(comp_profile)
        lat0 = (
            float(a["latency_ms"])
            if a and a.get("latency_ms") not in ("", "None", None)
            else None
        )
        lat1 = (
            float(b["latency_ms"])
            if b and b.get("latency_ms") not in ("", "None", None)
            else None
        )
        speedup = lat0 / lat1 if (lat0 and lat1) else None
        rows.append([
            model_id.replace("_", r"\_"), _fmt(lat0, 1), _fmt(lat1, 1),
            (_fmt(speedup, 2) + r"$\times$") if speedup is not None else "--",
        ])
    return _latex_table(
        rows,
        headers=[
            "Model",
            _label_from_row(base_profile),
            _label_from_row(comp_profile),
            "Speedup",
        ],
        caption=f"Cross-model microbench on HuggingFace VLAs (same prompt/image){gpu_note}.",
        label="tab:hf-microbench",
    )


def summarize_cross_hardware(paths: List[Path]) -> str:
    """compare-presets JSONs from different chips -> one table (reference
    contract summarize_results.py:245-272; single declared divergence: the
    first header reads 'Hardware' instead of 'GPU' — this is a TPU repo)."""
    rows = []
    for p in paths:
        payload = json.loads(p.read_text())
        by_preset = {r["preset"]: r for r in payload.get("rows", [])}
        base, blurr = by_preset.get("baseline"), by_preset.get("blurr")
        lat0 = float(base["latency_ms"]) if base else None
        lat1 = float(blurr["latency_ms"]) if blurr else None
        speedup = lat0 / lat1 if (lat0 and lat1) else None
        rows.append([
            str(payload.get("gpu", "unknown")).replace("_", r"\_"),
            _fmt(lat0, 1), _fmt(lat1, 1),
            (_fmt(speedup, 2) + r"$\times$") if speedup is not None else "--",
        ])
    return _latex_table(
        rows,
        headers=["Hardware", "Baseline (ms)", "BLURR (ms)", "Speedup"],
        caption="Cross-hardware Pi-0 microbench (baseline vs. BLURR preset; same script/config).",
        label="tab:cross-hardware",
    )


def main_results_dir(argv: Optional[List[str]] = None) -> None:
    """Reference-CLI-compatible mode (summarize_results.py:275-318):
    ``--results-dir DIR`` auto-discovers the known CSV filenames and prints
    every applicable table joined by blank lines."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--results-dir", type=str, required=True)
    parser.add_argument("--cross-hardware-json", type=str, nargs="*", default=[])
    args = parser.parse_args(argv)

    results_dir = Path(args.results_dir).expanduser().resolve()
    parts = []
    prompt_csv = results_dir / "prompt_length_sweep_pi0.csv"
    if prompt_csv.is_file():
        parts.append(summarize_prompt_sweep(prompt_csv))
    first_csv = results_dir / "first_vs_steady_pi0.csv"
    if first_csv.is_file():
        parts.append(summarize_first_vs_steady(first_csv))
    horizon_csv = results_dir / "horizon_sweep_success.csv"
    steps_latency_csv = results_dir / "steps_latency_pi0_bf16_compile.csv"
    if horizon_csv.is_file() and steps_latency_csv.is_file():
        parts.append(
            summarize_steps_tradeoff(
                horizon_csv=horizon_csv, steps_latency_csv=steps_latency_csv
            )
        )
    elif horizon_csv.is_file():
        parts.append(summarize_horizon_sweep(horizon_csv))
    hf_csv = results_dir / "hf_microbench.csv"
    if hf_csv.is_file():
        parts.append(summarize_hf_microbench(hf_csv))
    if args.cross_hardware_json:
        hw = [Path(p).expanduser().resolve() for p in args.cross_hardware_json]
        hw = [p for p in hw if p.is_file()]
        if hw:
            parts.append(summarize_cross_hardware(hw))
    if not parts:
        raise SystemExit(f"No known result files found under: {results_dir}")
    print("\n\n".join(parts))


def main() -> None:
    import sys

    if "--results-dir" in sys.argv[1:]:  # reference-compatible invocation
        return main_results_dir()
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
