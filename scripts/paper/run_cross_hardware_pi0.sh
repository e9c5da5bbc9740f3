#!/usr/bin/env bash
# Cross-hardware Pi-0 compare-presets run (analogue of the reference's
# run_cross_hardware_pi0.sbatch; run once per chip type — v5e/v5p/v4 — and
# aggregate with `summarize_results.py cross-hardware --json ...`).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
CHECKPOINT="${1:-random}"
CHIP_TAG="${CHIP_TAG:-tpu}"
OUT_DIR="${OUT_DIR:-$REPO_ROOT/runs/cross_hardware}"
mkdir -p "${OUT_DIR}"
cd "${REPO_ROOT}"

python -u scripts/paper/pi0_microbench.py compare-presets \
  --config config/eval/bridge.yaml \
  --checkpoint "${CHECKPOINT}" \
  --out-json "${OUT_DIR}/compare_presets_${CHIP_TAG}.json" \
  --presets baseline blurr \
  --warmup 5 --iters 50 \
  --skip-flops

echo "Wrote ${OUT_DIR}/compare_presets_${CHIP_TAG}.json"
