#!/usr/bin/env bash
# Repo health check: test suite (virtual 8-device CPU mesh) + CLI smokes +
# driver contracts. Safe to run without TPU hardware.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${REPO_ROOT}"
export BLURR_PLATFORM="${BLURR_PLATFORM:-cpu}"

# Default: FAST tier (pytest -m "not slow": 315 tests, measured ~10 min)
# + CLI smokes + driver contracts — enough to validate a focused change.
# --full adds the slow tier (200 tests: mesh parallelism, train loops, e2e
# CLI subprocesses, socket servers; measured 53 min total on the 1-vCPU
# box, 2026-08-19). The slow list lives in tests/conftest.py (SLOW_FILES).
FULL=0
if [[ "${1:-}" == "--full" ]]; then FULL=1; fi

echo "==== tests ===="
if [[ "$FULL" == 1 ]]; then
  python -m pytest tests/ -q
else
  python -m pytest tests/ -q -m "not slow"
  echo "(fast tier only — scripts/ci.sh --full runs the complete suite)"
fi

echo "==== CLI smokes (tiny configs, CPU) ===="
python scripts/benchmark_pi0.py --config config/eval/bridge_tiny.yaml \
  --checkpoint random --warmup 1 --iters 2 --skip-flops | grep "Average latency"
python scripts/eval_pi0_simpler.py --preset blurr --config config/eval/bridge_tiny.yaml \
  --task fake_widowx_carrot_on_plate --checkpoint random --n-eval-episode 1 \
  | grep -E "Success rate" >/dev/null && echo "eval_pi0_simpler OK"
python scripts/eval_pi0_simpler.py --preset blurr --config config/eval/fractal_tiny.yaml \
  --task fake_google_robot_pick_coke_can --checkpoint random --n-eval-episode 1 \
  | grep -E "Success rate" >/dev/null && echo "eval_pi0_fractal (EDR adapter) OK"
python scripts/eval_pi0_simpler.py --preset blurr --config config/eval/bridge_tiny.yaml \
  --task fake_widowx_carrot_on_plate --checkpoint random --n-eval-episode 2 \
  --batch-envs 2 | grep -E "Batched eval: 2 envs" >/dev/null \
  && echo "eval_pi0_simpler --batch-envs OK"
python scripts/benchmark_hf_vla.py --model-id random --warmup 1 --iters 2 \
  --skip-flops | grep "Average latency"
python scripts/benchmark_hf_vla.py --model-id random --warmup 1 --iters 2 \
  --skip-flops --decode jacobi | grep "Decode: jacobi" >/dev/null \
  && echo "benchmark_hf_vla --decode jacobi OK"
python scripts/collect_bridge_eval_results.py >/dev/null && echo "collector OK"
python scripts/demo_paligemma_text.py --max-new-tokens 4 --fused >/dev/null \
  && echo "text demo OK"

echo "==== paper harness chain (sweep -> scrape -> LaTeX) ===="
SWEEP_DIR="$(mktemp -d)"
python scripts/paper/horizon_sweep_simpler.py --checkpoint random \
  --config config/eval/bridge_tiny.yaml --steps 1 2 \
  --tasks fake_widowx_carrot_on_plate --episodes 1 \
  --out-root "$SWEEP_DIR/runs" --out-csv "$SWEEP_DIR/sweep.csv" >/dev/null
python scripts/paper/summarize_results.py horizon-sweep \
  --csv "$SWEEP_DIR/sweep.csv" > "$SWEEP_DIR/sweep.tex" \
  && grep -q "tabular" "$SWEEP_DIR/sweep.tex" && echo "paper chain OK"

echo "==== prismatic + train smokes ===="
python scripts/eval_prismatic_vla_simpler.py --checkpoint random \
  --task fake_widowx_carrot_on_plate --n-eval-episode 1 --max-steps 2 \
  --log-dir "$SWEEP_DIR/prism" >/dev/null 2>&1
grep -q "Success rate" "$SWEEP_DIR/prism/run.log" && echo "eval_prismatic OK"
python scripts/train_pi0_flow.py --config config/eval/bridge_tiny.yaml \
  --steps 2 --batch-size 2 --save-dir "" 2>&1 | grep -q "Done. final loss" \
  && echo "train OK"
XLA_FLAGS="--xla_force_host_platform_device_count=2 ${XLA_FLAGS:-}" \
  python scripts/train_pi0_flow.py --config config/eval/bridge_tiny_pp.yaml \
  --steps 2 --batch-size 2 --pp 2 --save-dir "" 2>&1 \
  | grep -q "Done. final loss" && echo "train --pp 2 OK"
XLA_FLAGS="--xla_force_host_platform_device_count=2 ${XLA_FLAGS:-}" \
  python scripts/train_pi0_flow.py --config config/eval/bridge_tiny.yaml \
  --steps 2 --batch-size 2 --sp 2 --save-dir "" 2>&1 \
  | grep -q "Done. final loss" && echo "train --sp 2 OK"
python scripts/train_pi0_flow.py --config config/eval/bridge_tiny.yaml \
  --steps 2 --batch-size 2 --lora-rank 2 --train-scope action_expert \
  --save-dir "" 2>&1 | grep -q "Done. final loss" && echo "train --lora-rank OK"
python scripts/train_openvla_lora.py --model-id random --steps 2 \
  --batch-size 2 --lora-rank 2 --dtype fp32 2>&1 \
  | grep -q "Done. final loss" && echo "train_openvla_lora OK"
python scripts/eval_openloop.py --config config/eval/bridge_tiny.yaml \
  --checkpoint random --examples 4 --batch-size 2 2>&1 \
  | grep -q "Open-loop eval:" && echo "eval_openloop OK"
python scripts/eval_openloop_vla.py --model-id random --dtype fp32 \
  --examples 4 --batch-size 2 2>&1 \
  | grep -q "Open-loop VLA eval" && echo "eval_openloop_vla OK"
rm -rf "$SWEEP_DIR"

echo "==== driver contracts ===="
python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
import jax
fn, args = g.entry()
out = jax.eval_shape(fn, *args)
print('entry eval_shape OK:', out.shape)
"
echo "ALL GREEN"
