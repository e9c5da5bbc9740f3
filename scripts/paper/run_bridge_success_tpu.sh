#!/usr/bin/env bash
# Bridge success evals for OpenVLA(-OFT) on TPU (analogue of the reference's
# run_bridge_success_*_oft_only.sbatch family: baseline vs blurr presets per
# model over the 4 Bridge tasks).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
MODEL_ID="${1:?usage: $0 <model-id-or-snapshot-dir> [episodes]}"
EPISODES="${2:-100}"
cd "${REPO_ROOT}"

TASKS=(widowx_carrot_on_plate widowx_spoon_on_towel widowx_stack_cube widowx_put_eggplant_in_basket)

for PRESET in baseline blurr; do
  python -u scripts/eval_hf_vla_simpler.py \
    --model-id "${MODEL_ID}" \
    --preset "${PRESET}" \
    --task "${TASKS[@]}" \
    --n-eval-episode "${EPISODES}" \
    --initial-states eval
done

echo "Summarize with: python scripts/paper/summarize_bridge_success.py runs/eval_bridge/hf_*/*/summary.json"
