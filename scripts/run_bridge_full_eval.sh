#!/usr/bin/env bash
# Full Bridge benchmark batch: every WidowX task under both the baseline and
# the BLURR preset, aggregated afterwards by collect_bridge_eval_results.py.
# Env knobs: EPISODES (default 100), VIDEOS (default 0), HF/cache dirs.
set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

CHECKPOINT="${1:-}"
[[ -n "${CHECKPOINT}" ]] || {
  echo "Usage: $0 /path/to/pi0_checkpoint.pt   (or 'random' for smoke runs)"
  exit 2
}

# caches + host-thread pinning knobs
: "${HF_HOME:=$ROOT/hf_cache}"
: "${TRANSFORMERS_CACHE:=$HF_HOME}"
: "${MS2_REAL2SIM_ASSET_DIR:=}"
: "${OMP_NUM_THREADS:=1}"
: "${MKL_NUM_THREADS:=1}"
: "${OPENBLAS_NUM_THREADS:=1}"
export HF_HOME TRANSFORMERS_CACHE MS2_REAL2SIM_ASSET_DIR \
       OMP_NUM_THREADS MKL_NUM_THREADS OPENBLAS_NUM_THREADS

EPISODES="${EPISODES:-100}"
VIDEOS="${VIDEOS:-0}"
CONFIG="${CONFIG:-config/eval/bridge.yaml}"  # tiny smoke: config/eval/bridge_tiny.yaml

# the four WidowX Bridge tasks, under both presets
TASKS=(
  widowx_spoon_on_towel
  widowx_carrot_on_plate
  widowx_stack_cube
  widowx_put_eggplant_in_basket
)
PRESETS=(baseline blurr)

run_eval() {  # $1=preset $2=task
  python -u "$ROOT/scripts/eval_pi0_simpler.py" \
    --preset "$1" \
    --config "$CONFIG" \
    --task "$2" \
    --checkpoint "$CHECKPOINT" \
    --n-eval-episode "$EPISODES" \
    --n-video "$VIDEOS"
}

for TASK in "${TASKS[@]}"; do
  echo "===================== TASK: ${TASK} ====================="
  for PRESET in "${PRESETS[@]}"; do
    echo "--- preset: ${PRESET} ---"
    run_eval "$PRESET" "$TASK"
  done
done

echo "Done. Aggregate with:"
echo "  python scripts/collect_bridge_eval_results.py"
