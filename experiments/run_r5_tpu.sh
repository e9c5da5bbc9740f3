#!/usr/bin/env bash
# Round-5 pending real-TPU measurements, in priority order (round-4 verdict
# Next #4/#5/#6). Logs go unbuffered to /tmp/tpu_r5/ (never pipe background
# jobs through tail — CLAUDE.md); each step is independently skippable.
#   bash experiments/run_r5_tpu.sh
set -u
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${REPO_ROOT}"
OUT=/tmp/tpu_r5
mkdir -p "$OUT"

echo "== 0) tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

run() { # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  PYTHONUNBUFFERED=1 timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 \
    && echo "   OK  ($OUT/$name.log)" \
    || echo "   FAILED rc=$? ($OUT/$name.log)"
}

# 1) GPTQ closed-loop rows (calibration-based w4a8 rounding): the two gptq
#    variants + their dims-matched bf16 controls (pulled in automatically)
run quant_gptq 5400 python experiments/quant_closed_loop.py \
  w4a8_gptq pool64_w4a8_gptq

# 2) 7B QLoRA train -> save -> serve -> continue-train -> hot-reload under
#    traffic (writes docs/results/train_serve_handoff_7b_v5e.csv)
run handoff7b 5400 python experiments/train_serve_handoff_7b.py

# 3) QLoRA-7B: time EVERY fitting donated config (fills the step_ms
#    column of docs/results/qlora7b_memory_v5e.csv)
run qlora_steps 7200 python experiments/qlora7b_memory.py

echo "all done; logs in $OUT"
