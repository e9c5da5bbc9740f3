#!/usr/bin/env python3
"""Compute-vs-success scatter (parity surface: reference
scripts/paper/plot_gflops_success.py). The GFLOPS constants are the paper's
published Table-1 values (reference README.md:220-231 / the reference script
hard-codes them the same way); success for the OpenVLA points comes from
summary.json files or CLI overrides."""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

# Published Table-1 effective-GFLOPS (H100, 224x224, 256 visual tokens).
PAPER_GFLOPS = {
    "OpenVLA": 5835.0,
    "OpenVLA-OFT": 49886.0,
    "pi0-baseline": 39038.0,
    "Interleave-pi0": 7989.0,
    "BLURR-pi0": 73525.0,
}


def _read_avg_success(path: Path) -> float:
    payload = json.loads(path.read_text())
    if "avg_success" not in payload:
        raise KeyError(
            f"{path} has no 'avg_success' key (expected an "
            f"eval_*_simpler summary.json); keys: {sorted(payload)[:8]}"
        )
    return float(payload["avg_success"])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--openvla-summary", type=str, default="")
    parser.add_argument("--openvla-oft-summary", type=str, default="")
    parser.add_argument("--openvla-success", type=float, default=None)
    parser.add_argument("--openvla-oft-success", type=float, default=None)
    parser.add_argument("--pi0-baseline-success", type=float, default=0.70)
    parser.add_argument("--interleave-success", type=float, default=0.70)
    parser.add_argument("--blurr-success", type=float, default=0.71)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    openvla_success = (
        args.openvla_success
        if args.openvla_success is not None
        else (_read_avg_success(Path(args.openvla_summary)) if args.openvla_summary else 0.56)
    )
    oft_success = (
        args.openvla_oft_success
        if args.openvla_oft_success is not None
        else (
            _read_avg_success(Path(args.openvla_oft_summary))
            if args.openvla_oft_summary
            else 0.60
        )
    )

    points: Dict[str, Tuple[float, float]] = {
        "OpenVLA": (PAPER_GFLOPS["OpenVLA"], openvla_success),
        "OpenVLA-OFT": (PAPER_GFLOPS["OpenVLA-OFT"], oft_success),
        r"$\pi_0$ baseline": (PAPER_GFLOPS["pi0-baseline"], args.pi0_baseline_success),
        r"Interleave-$\pi_0$": (PAPER_GFLOPS["Interleave-pi0"], args.interleave_success),
        r"BLURR-$\pi_0$": (PAPER_GFLOPS["BLURR-pi0"], args.blurr_success),
    }

    x_max = max(x for x, _ in points.values())
    y_scale = x_max

    fig, ax = plt.subplots(figsize=(7.2, 3.6), dpi=200)
    theta = np.linspace(0.0, math.pi / 2.0, 256)
    for _name, (x, success) in points.items():
        y = success * y_scale
        r = math.hypot(x, y)
        ax.plot(
            r * np.cos(theta), r * np.sin(theta),
            color="#c7c7c7", linewidth=1.0, linestyle="--", zorder=0,
        )

    blurr_x, blurr_success = points[r"BLURR-$\pi_0$"]
    slope = blurr_success * y_scale / blurr_x
    ray_x = np.linspace(0.0, x_max * 1.08, 128)
    ax.plot(ray_x, slope * ray_x, color="#f39c12", linewidth=1.5, linestyle="--")

    colors = {
        "OpenVLA": "#1f77b4",
        "OpenVLA-OFT": "#9467bd",
        r"$\pi_0$ baseline": "#7f7f7f",
        r"Interleave-$\pi_0$": "#2ca02c",
        r"BLURR-$\pi_0$": "#d62728",
    }
    for name, (x, success) in points.items():
        ax.scatter(
            [x], [success * y_scale], s=48, color=colors[name], zorder=3, label=name
        )

    ax.set_xlim(0, x_max * 1.1)
    ax.set_ylim(0, y_scale * 1.05)
    ax.set_xlabel("Effective GFLOPS")
    yticks = np.linspace(0, 1.0, 6)
    ax.set_yticks(yticks * y_scale)
    ax.set_yticklabels([f"{t:.1f}" for t in yticks])
    ax.set_ylabel("Avg. Bridge success")
    ax.legend(loc="lower right", fontsize=8)
    fig.tight_layout()
    out = Path(args.out).expanduser()
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out)
    print(f"Wrote: {out}")


if __name__ == "__main__":
    main()
