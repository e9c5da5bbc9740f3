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


def masked_freeze(inner, mask):
    """``inner`` on mask==True leaves, ZERO updates everywhere else — the
    parameter-group FREEZE (the reference's requires_grad_(False) semantics,
    reference third_party/open_pi_zero/src/model/vla/pizero.py freeze_*).

    Bare ``optax.masked(inner, mask)`` is NOT a freeze: optax defines it as
    "transform the masked-in updates, pass the rest through UNCHANGED", so
    apply_updates would ADD each raw gradient to every "frozen" parameter
    (gradient ascent on the frozen group). The second masked stage pins
    those updates to zero.
    """
    import optax

    inv = jax.tree.map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv),
    )


def params_ema(decay: float = 0.999):
    """Optax transform that tracks an exponential moving average of the
    POST-UPDATE parameters in its state (new design — flow/diffusion
    policies are commonly served from EMA weights; the reference has no
    training pipeline at all, SURVEY.md §0).

    Chain it AFTER the optimizer proper::

        tx = optax.chain(masked_freeze(optax.adamw(sched), mask),
                         params_ema(0.999))

    The EMA tree lives inside ``opt_state``, so checkpoint/exact-resume
    (save_train_state) and GSPMD shardings (opt_state inherits the params')
    cover it with zero extra plumbing; pull it out with
    :func:`extract_ema`. Updates pass through unchanged.
    """
    import optax

    def init(params):
        # a REAL copy: jnp.asarray would alias the param buffers, and an
        # aliased ema makes donate_argnums=(0,1) donate the same buffer
        # twice (params once, opt_state once) — XLA rejects the execute
        ema = jax.tree.map(lambda p: jnp.array(p, copy=True), params)
        return {"ema": ema, "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("params_ema needs params (optax passes them "
                             "when the chain receives them)")
        new_params = optax.apply_updates(params, updates)
        # bias-corrected like adamw's moments: early steps track the actual
        # weights instead of the init
        count = state["count"] + 1
        d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
        ema = jax.tree.map(
            lambda e, p: (d * e.astype(jnp.float32)
                          + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
            state["ema"], new_params,
        )
        return updates, {"ema": ema, "count": count}

    return optax.GradientTransformation(init, update)


def extract_ema(opt_state):
    """Pull the EMA parameter tree from an opt_state produced by a chain
    containing :func:`params_ema` (searched by the state's dict shape)."""
    found = []

    def walk(s):
        if isinstance(s, dict) and set(s.keys()) == {"ema", "count"}:
            found.append(s["ema"])
            return
        if isinstance(s, (tuple, list)):
            for x in s:
                walk(x)

    walk(opt_state)
    if not found:
        raise ValueError("no params_ema state found in opt_state")
    return found[0]
