"""Utility-module coverage: metrics, schedules, spec, decorators, native."""

import numpy as np

import jax.numpy as jnp

from blurr_tpu.utils.decorator import conditional_decorator, main_rank_only
from blurr_tpu.utils.metric import get_action_accuracy
from blurr_tpu.utils.optim import (
    cosine_annealing_warmup_restarts,
    get_num_params_in_billions,
)
from blurr_tpu.utils.spec import ModuleSpec


def test_action_accuracy_thresholds():
    gt = jnp.zeros((2, 3, 4))
    pred = jnp.full((2, 3, 4), 0.15)
    acc = np.asarray(get_action_accuracy(gt, pred, thresholds=[0.1, 0.2]))
    # all dims off by 0.15: fails the 0.1 threshold, passes 0.2
    np.testing.assert_allclose(acc, [0.0, 1.0])
    # one dimension out of threshold fails the whole step
    pred2 = gt.at[0, 0, 0].set(0.5)
    acc2 = np.asarray(get_action_accuracy(gt, pred2, thresholds=[0.2]))
    np.testing.assert_allclose(acc2, [5.0 / 6.0])


def test_cosine_schedule_shape():
    sched = cosine_annealing_warmup_restarts(
        first_cycle_steps=10, max_lr=1.0, min_lr=0.1, warmup_steps=2
    )
    assert sched(0) == 0.1                      # warmup start at min
    assert abs(sched(2) - 1.0) < 1e-9           # peak after warmup
    assert sched(9) < sched(5) < sched(2)       # cosine decay
    # restart: second cycle begins warming up again
    assert sched(10) < sched(12) <= 1.0


def test_cosine_schedule_cycle_mult_and_gamma():
    sched = cosine_annealing_warmup_restarts(
        first_cycle_steps=4, cycle_mult=2.0, max_lr=1.0, min_lr=0.0,
        warmup_steps=1, gamma=0.5,
    )
    # second cycle's peak is halved
    assert abs(sched(5) - 0.5) < 1e-9  # step 5 = cycle 1, end of warmup


def test_num_params():
    params = {"a": jnp.zeros((1000, 1000)), "b": {"c": jnp.zeros((500,))}}
    assert abs(get_num_params_in_billions(params) - (1_000_500 / 1e9)) < 1e-12


def test_module_spec_roundtrip():
    spec = ModuleSpec.create("blurr_tpu.utils.metric:get_action_accuracy")
    fn = ModuleSpec.instantiate(spec)
    out = np.asarray(fn(jnp.zeros((1, 2, 3)), jnp.zeros((1, 2, 3))))
    np.testing.assert_allclose(out, [1.0, 1.0])
    assert "get_action_accuracy" in ModuleSpec.to_string(spec)


def test_conditional_decorator():
    calls = []

    def dec(f):
        def wrapped(*a):
            calls.append(1)
            return f(*a)

        return wrapped

    @conditional_decorator(dec, True)
    def f1(x):
        return x + 1

    @conditional_decorator(dec, False)
    def f2(x):
        return x + 1

    assert f1(1) == 2 and calls == [1]
    assert f2(1) == 2 and calls == [1]


def test_main_rank_only_runs_on_rank0():
    @main_rank_only
    def f():
        return 42

    assert f() == 42  # single-process == rank 0


def test_compiled_hbm_analysis():
    """memory_analysis-based HBM reporting: args + outputs accounted exactly
    for a trivial program (the axon tunnel's memory_stats() returns {}, so
    this path is what bench.py / benchmark_pi0.py report)."""
    import jax

    from blurr_tpu.utils.monitor import compiled_hbm_gb, program_peak_hbm_gb

    x = jnp.ones((1024, 1024), jnp.float32)  # 4 MiB
    y = jnp.ones((1024, 1024), jnp.float32)
    compiled = jax.jit(lambda a, b: a @ b).lower(x, y).compile()
    stats = compiled_hbm_gb(compiled)
    if not stats:  # memory_analysis unavailable on this backend/version
        pytest.skip("compiled.memory_analysis() unavailable; fallback path")
    assert stats["argument_gb"] == 8 / 1024  # two 4 MiB args
    assert stats["output_gb"] == 4 / 1024
    assert stats["peak_gb"] >= 12 / 1024
    assert program_peak_hbm_gb(lambda a, b: a @ b, x, y) == stats["peak_gb"]


def test_compile_cache_env_knob(tmp_path):
    """BLURR_COMPILE_CACHE=<dir> wires JAX's persistent compilation cache at
    import time: a jitted program in a fresh process leaves serialized
    executables in the directory (min entry size / compile time forced to 0
    so even tiny warmup shapes are cached). Host-attached deployments get
    compile-once server restarts from this; over the axon tunnel compilation
    is remote so the knob is a no-op there (documented in __init__)."""
    import os
    import subprocess
    import sys

    cache_dir = tmp_path / "xla_cache"
    cache_dir.mkdir()
    env = dict(os.environ)
    env.update(
        BLURR_PLATFORM="cpu",
        BLURR_COMPILE_CACHE=str(cache_dir),
        JAX_PLATFORMS="cpu",
    )
    code = (
        "import blurr_tpu, jax, jax.numpy as jnp;"
        "jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones((64, 64)))"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=120)
    entries = list(cache_dir.iterdir())
    assert entries, "persistent compile cache left no entries"
