"""Timing / memory observability (parity surface: reference
src/utils/monitor.py, with CUDA facilities mapped to TPU equivalents)."""

from __future__ import annotations

import logging
import time
from functools import wraps

import jax


def log_allocated_tpu_memory(log=None, stage: str = "loading model", device=None):
    """HBM usage via device memory_stats (the torch.cuda.memory_allocated
    equivalent)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    if not stats:
        # e.g. the axon tunnel: memory_stats() is empty — say so instead of
        # printing a fabricated "0.00 GB" (use compiled_hbm_gb for an exact
        # per-program footprint there)
        msg = (
            f"Allocated TPU HBM after {stage}: unavailable "
            f"(memory_stats empty on {device.platform})"
        )
        (log.info if log else print)(msg)
        return 0.0
    allocated = stats.get("bytes_in_use", 0) / 1024**3
    msg = f"Allocated TPU HBM after {stage}: {allocated:.2f} GB"
    (log.info if log else print)(msg)
    return allocated


def peak_tpu_memory_gb(device=None) -> float:
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 1024**3


# kept under the reference name for drop-in compatibility
log_allocated_gpu_memory = log_allocated_tpu_memory


def compiled_hbm_gb(compiled) -> dict:
    """HBM footprint of a compiled XLA program from its buffer assignment.

    ``compiled`` is the result of ``jax.jit(f).lower(*args).compile()`` (which
    is itself callable with the same args). Unlike ``device.memory_stats()``
    — which returns ``{}`` over the axon TPU tunnel — the analysis is exact
    and available everywhere: it reports the argument (weights + inputs),
    output, and temp/scratch bytes XLA reserved for the program, the VRAM
    axis of the reference's benchmark tables (reference
    scripts/benchmark_pi0.py:283-300, README.md:228-231).
    """
    try:
        ma = compiled.memory_analysis()
    except Exception:
        ma = None
    if ma is None:
        return {}

    def get(name):
        return float(getattr(ma, name, 0) or 0)

    total = get("peak_memory_in_bytes")
    if not total:
        total = (
            get("argument_size_in_bytes")
            + get("output_size_in_bytes")
            + get("temp_size_in_bytes")
            - get("alias_size_in_bytes")
        )
    gib = 1024**3
    return {
        "peak_gb": total / gib,
        "argument_gb": get("argument_size_in_bytes") / gib,
        "output_gb": get("output_size_in_bytes") / gib,
        "temp_gb": get("temp_size_in_bytes") / gib,
        "alias_gb": get("alias_size_in_bytes") / gib,
    }


def program_peak_hbm_gb(fn, *args, **kwargs) -> float:
    """Peak HBM of ``jit(fn)(*args)``: lowers + compiles and reads the buffer
    assignment. Falls back to 0.0 if analysis is unavailable."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
    except Exception:
        return 0.0
    return compiled_hbm_gb(compiled).get("peak_gb", 0.0)


def log_execution_time(logger=None):
    """Decorator logging wall-clock of a call."""

    def decorator(func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            start = time.perf_counter()
            result = func(*args, **kwargs)
            elapsed = time.perf_counter() - start
            msg = f"{func.__name__} took {elapsed:.2f} seconds"
            (logger.info if logger else print)(msg)
            return result

        return wrapper

    return decorator


class Timer:
    def __init__(self):
        self._start = time.perf_counter()

    def __call__(self, reset: bool = True) -> float:
        now = time.perf_counter()
        diff = now - self._start
        if reset:
            self._start = now
        return diff


class MainRankFilter(logging.Filter):
    """Log filter passing records only on the main rank (parity with
    reference monitor.py:51-58; JAX process_index based)."""

    def __init__(self, main_rank: int = 0):
        super().__init__()
        self.main_rank = main_rank

    def filter(self, record):
        return jax.process_index() == self.main_rank


def _fetch_scalar(out):
    """Force device completion by fetching a tiny slice of one output leaf.

    On the axon TPU tunnel ``block_until_ready`` does not actually block; a
    data fetch does (and the device executes its queue in order), so fetching
    one element of the LAST queued result fences all prior work."""
    import numpy as np

    leaves = jax.tree.leaves(out)
    leaf = leaves[0]
    idx = tuple(slice(0, 1) for _ in leaf.shape)
    return np.asarray(leaf[idx] if leaf.ndim else leaf)


def timed_call(fn, *args, warmup: int = 3, iters: int = 20):
    """Benchmark a device function: returns (per_iter_s, mean_s, details).

    Uses a two-point scheme that cancels the host<->device round-trip: time
    (1 call + fetch) and (1 + iters calls + fetch); the difference divided by
    ``iters`` is the pure device step latency. This is necessary on the axon
    tunnel where only fetches block, and it is also how one avoids counting
    dispatch overhead on local TPUs.
    """
    for _ in range(max(warmup, 1)):
        _fetch_scalar(fn(*args))

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _fetch_scalar(out)
        return time.perf_counter() - t0

    t_base = min(run(1) for _ in range(3))
    t_fulls = [run(1 + iters) for _ in range(2)]
    t_full = min(t_fulls)
    per_iter = max((t_full - t_base) / iters, 1e-9)
    # second value: the MEAN over the full-run repeats (>= the min-based
    # estimate); the first is the jitter-free floor callers report as p50
    per_iter_mean = max((sum(t_fulls) / len(t_fulls) - t_base) / iters, 1e-9)
    return per_iter, per_iter_mean, {
        "t_base": t_base, "t_full": t_full, "iters": iters,
    }
