#!/usr/bin/env bash
# Pending real-TPU measurements, in priority order. STATUS (round 4,
# 2026-08-19): every item below has been executed and landed in
# docs/results/ — bench (full preset ladder), batched-eval (post-fix
# re-sweep + phase attribution), flash-at-batch (negative result),
# OpenVLA SLO (full 7B rows), QLoRA-7B (remat sweep + step times),
# Pi-0 SLO (occupancy/padding columns), Jacobi (latency + convergence).
# Kept as the re-run entrypoint for future hardware.
# Run when the axon tunnel is back:   bash experiments/run_pending_tpu.sh
# Logs go unbuffered to /tmp/tpu_meas/ (never pipe background jobs through
# tail — CLAUDE.md); each step is independently skippable on failure.
set -u
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${REPO_ROOT}"
OUT=/tmp/tpu_meas
mkdir -p "$OUT"

echo "== 0) tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

run() { # name, cmd...
  local name=$1; shift
  echo "== $name =="
  PYTHONUNBUFFERED=1 timeout 3600 "$@" > "$OUT/$name.log" 2>&1 \
    && echo "   OK  ($OUT/$name.log)" \
    || echo "   FAILED rc=$? ($OUT/$name.log)"
}

# 1) headline bench sanity: the custom-vjp wrappers on w8a8/w4a8 must not
#    have moved the inference primal (expected: ~11.8 ms bf16 line)
run bench python bench.py

# 2) the two round-3 experiments written while the tunnel was down
run batched_eval_throughput python experiments/batched_eval_throughput.py
run bench_flash_batch python experiments/bench_flash_batch.py

# 3) OpenVLA-family server-level SLO (writes docs/results/serving_openvla_slo_v5e.csv)
run serving_openvla_slo python experiments/serving_openvla_slo.py

# 4) QLoRA 7B on one chip: compiled-HBM + step time for the w8a8-base
#    LoRA fine-tune (the capacity headline for the new trainer)
run qlora7b_fit python experiments/qlora7b_memory.py

# 5) Pi-0 SLO re-sweep: the harness now records server-side batch
#    occupancy/padding per sweep point ({"kind": "stats"} counter diffs) —
#    refresh docs/results/serving_slo_v5e.csv with the new columns
run serving_slo python experiments/serving_slo.py

# 6) Jacobi self-speculative decode: AR vs fixed-point latency + iteration
#    counts for OpenVLA-7B bf16/w8a8 and MiniVLA
#    (writes docs/results/jacobi_decode_v5e.csv)
run bench_jacobi python experiments/bench_jacobi.py

echo "all done; logs in $OUT"
