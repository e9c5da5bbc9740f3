"""Profiling helpers (aux-subsystem parity: the reference uses
torch.profiler one-shots, SURVEY.md §5). XLA traces via jax.profiler when the
backend supports it; analytic FLOPs otherwise (utils.flops)."""

from __future__ import annotations

import contextlib
import logging

log = logging.getLogger(__name__)


@contextlib.contextmanager
def maybe_trace(log_dir: str | None):
    """jax.profiler.trace context when a log dir is given and the backend
    supports tracing; no-op otherwise (the axon tunnel does not)."""
    if not log_dir:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
        log.info("Wrote XLA trace to %s", log_dir)
    except Exception as exc:
        log.warning("Profiler trace unavailable (%s); continuing.", exc)
        yield
