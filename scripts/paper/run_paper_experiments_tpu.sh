#!/usr/bin/env bash
# 5-stage paper experiment pipeline on TPU (analogue of the reference's
# run_paper_experiments_h100.sbatch SLURM job; TPU fleets are driven by plain
# shell / gcloud instead of SLURM).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
CHECKPOINT="${1:-random}"
OUT_DIR="${OUT_DIR:-$REPO_ROOT/runs/paper_tpu}"
TEXT_TOKENS="${TEXT_TOKENS:-1 4 8 16}"
HORIZON_STEPS="${HORIZON_STEPS:-1 2 4 6 10}"
HORIZON_EPISODES="${HORIZON_EPISODES:-25}"
HF_MODELS="${HF_MODELS:-random-7b}"
HF_PROFILES="${HF_PROFILES:-bf16_compile}"
mkdir -p "${OUT_DIR}"
cd "${REPO_ROOT}"

echo "==== [1/5] Prompt length sweep (KV cache on/off) ===="
python -u scripts/paper/pi0_microbench.py prompt-sweep \
  --config config/eval/bridge.yaml \
  --checkpoint "${CHECKPOINT}" \
  --out-csv "${OUT_DIR}/prompt_length_sweep_pi0.csv" \
  --text-tokens ${TEXT_TOKENS} \
  --num-inference-steps 10 \
  --warmup 5 --iters 50 \
  --skip-flops

echo "==== [2/5] First-call vs steady-state ===="
python -u scripts/paper/pi0_microbench.py first-vs-steady \
  --config config/eval/bridge.yaml \
  --checkpoint "${CHECKPOINT}" \
  --out-csv "${OUT_DIR}/first_vs_steady_pi0.csv" \
  --warmup 5 --iters 50

echo "==== [3/5] Latency vs num_inference_steps sweep ===="
python -u scripts/paper/pi0_microbench.py steps-sweep \
  --config config/eval/bridge.yaml \
  --checkpoint "${CHECKPOINT}" \
  --out-csv "${OUT_DIR}/steps_latency_pi0_bf16_compile.csv" \
  --steps 1 2 4 6 10 \
  --use-bf16 --use-torch-compile \
  --warmup 5 --iters 50 \
  --skip-flops

echo "==== [4/5] Success vs horizon sweep (SimplerEnv) ===="
python -u scripts/paper/horizon_sweep_simpler.py \
  --config config/eval/bridge.yaml \
  --checkpoint "${CHECKPOINT}" \
  --out-root "${OUT_DIR}/horizon_sweep_runs" \
  --out-csv "${OUT_DIR}/horizon_sweep_success.csv" \
  --steps ${HORIZON_STEPS} \
  --episodes ${HORIZON_EPISODES} \
  --disable-torch-compile

echo "==== [5/5] Cross-model VLA microbench (OpenVLA family) ===="
python -u scripts/paper/hf_microbench.py \
  --out-csv "${OUT_DIR}/hf_microbench.csv" \
  --model-id ${HF_MODELS} \
  --profiles ${HF_PROFILES} \
  --warmup 5 --iters 50 \
  --skip-flops

echo "All paper experiments finished. Results in: ${OUT_DIR}"
