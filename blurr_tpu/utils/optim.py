"""Training-side optimizer utilities (parity surface: reference
src/utils/optim.py, re-expressed as optax-style schedules and pytree
helpers)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    cycle_mult: float = 1.0,
    max_lr: float = 0.1,
    min_lr: float = 0.001,
    warmup_steps: int = 0,
    gamma: float = 1.0,
):
    """Schedule function step -> lr with linear warmup + cosine cycles whose
    length multiplies by ``cycle_mult`` and peak decays by ``gamma`` per
    cycle (semantics of the reference's CosineAnnealingWarmupRestarts)."""
    assert warmup_steps < first_cycle_steps

    def schedule(step):
        step = float(step)
        cycle = 0
        cycle_steps = first_cycle_steps
        step_in_cycle = step
        while step_in_cycle >= cycle_steps:
            step_in_cycle -= cycle_steps
            cycle += 1
            cycle_steps = cycle_steps * cycle_mult
        peak = max_lr * (gamma**cycle)
        if step_in_cycle < warmup_steps:
            return (peak - min_lr) * step_in_cycle / warmup_steps + min_lr
        progress = (step_in_cycle - warmup_steps) / (cycle_steps - warmup_steps)
        return min_lr + (peak - min_lr) * (1 + math.cos(math.pi * progress)) / 2

    return schedule


def get_num_params_in_billions(params) -> float:
    total = sum(int(x.size) for x in jax.tree.leaves(params))
    return total / 1e9


def cast_params(params, dtype):
    """The ``optimizer_to`` analogue: move/cast a parameter pytree."""
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
