"""Small decorators (parity surface: reference src/utils/decorator.py).

The reference's NoSyncBase DDP shim has no TPU meaning — gradient
accumulation composes functionally in JAX — so only the generic pieces carry
over, plus a process-0 gate built on jax.process_index.
"""

from __future__ import annotations

from functools import wraps

import jax


def conditional_decorator(dec, condition: bool):
    """Apply ``dec`` only when ``condition`` holds."""

    def decorator(func):
        if not condition:
            return func
        return dec(func)

    return decorator


def main_rank_only(func):
    """Run only on JAX process 0 (multi-host); returns None elsewhere."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        if jax.process_index() != 0:
            return None
        return func(*args, **kwargs)

    return wrapper
