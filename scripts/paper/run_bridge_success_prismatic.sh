#!/usr/bin/env bash
# MiniVLA/prismatic Bridge success eval on TPU (analogue of the reference's
# run_bridge_success_l40s_minivla_prismatic.sbatch).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
CHECKPOINT="${1:?usage: $0 <prismatic-.pt-or-random> [episodes]}"
EPISODES="${2:-100}"
cd "${REPO_ROOT}"

TASKS=(widowx_carrot_on_plate widowx_spoon_on_towel widowx_stack_cube widowx_put_eggplant_in_basket)

python -u scripts/eval_prismatic_vla_simpler.py \
  --checkpoint "${CHECKPOINT}" \
  --task "${TASKS[@]}" \
  --n-eval-episode "${EPISODES}" \
  --initial-states eval

echo "Summarize with: python scripts/paper/summarize_bridge_success.py runs/eval_bridge/prismatic_*/*/summary.json"
