"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware.

NOTE: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) at the env
level, so the env var alone is not enough — jax.config.update after import is
what actually switches the backend. Matmul precision is raised to 'highest'
so float32 parity tests are not subject to MXU bf16 defaults.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib  # noqa: E402

import pytest  # noqa: E402

# Fast/slow tier split (one central, MEASURED list — not per-file marks).
# "slow" = files that took >60 s on the 1-vCPU reference box (full-suite
# timing 2026-08-19: 53 min / 514 tests), EXCEPT the three core
# model-family unit suites (test_pizero 75 s, test_quant 82 s,
# test_openvla 92 s) which stay in the fast tier for coverage. Fast tier
# = ~10 min; `scripts/ci.sh` runs it by default, `--full` adds the rest.
SLOW_FILES = {
    "test_parallel.py",                     # 461 s - 8-dev mesh programs
    "test_openvla_lora_train.py",           # 383 s - LoRA/QLoRA train loops
    "test_mixed_precision.py",              # 367 s - fp32/bf16 sweeps
    "test_eval_e2e.py",                     # 366 s - CLI subprocess runs
    "test_pipeline.py",                     # 283 s - pipeline-parallel mesh
    "test_lora_training.py",                # 126 s - Pi-0 LoRA train loops
    "test_serving.py",                      # 125 s - socket servers
    "test_data.py",                         # 107 s - streaming shards
    "test_serving_openvla.py",              #  79 s - socket servers
    "test_eval_openloop.py",                #  76 s - open-loop evaluators
    "test_paligemma.py",                    #  73 s - greedy decode e2e
    "test_reference_parity_agent_loop.py",  #  73 s - whole-loop torch diff
    "test_batched_eval.py",                 #  67 s - lockstep batched eval
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if pathlib.Path(str(item.fspath)).name in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
