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


def cast_floating_preserving_scales(params, dtype):
    """Cast floating leaves to ``dtype`` EXCEPT the scale leaves inside
    quantized-weight dicts ({"q"/"q8a"/"q4", "s"} — ops/quant.py keeps
    those fp32 by design: the dequant rescale runs in fp32, and casting a
    per-channel scale to bf16 adds up to ~0.4% multiplicative weight error
    for zero memory win) and LoRA "lora_s" scalars. int leaves pass
    through untouched."""

    def cast(a):
        return (a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a)

    def walk(t):
        if t is None:
            return None
        if isinstance(t, dict):
            if {"q", "q8a", "q4", "fp"} & set(t):
                return t  # quantized dict: int payload + fp32 scales as-is
            if "lora_a" in t:
                return {
                    k: (walk(v) if k == "w"
                        else v if k == "lora_s" else cast(v))
                    for k, v in t.items()
                }
            return {k: walk(v) for k, v in t.items()}
        return cast(t)

    return walk(params)


def value_and_grad_frozen_int(loss_fn):
    """``jax.value_and_grad`` over trees with frozen INTEGER leaves (QLoRA
    int8/int4 bases): differentiates with ``allow_int`` and replaces the
    resulting float0 "grads" with typed zeros, so masked transforms and
    ``apply_updates`` stay shape/dtype-closed over the whole tree."""
    vg = jax.value_and_grad(loss_fn, allow_int=True)

    def wrapped(params, *args):
        loss, grads = vg(params, *args)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p)
            if g.dtype == jax.dtypes.float0 else g,
            grads, params,
        )
        return loss, grads

    return wrapped


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


def params_ema(decay: float = 0.999, mask=None):
    """Optax transform that tracks an exponential moving average of the
    POST-UPDATE parameters in its state (new design — flow/diffusion
    policies are commonly served from EMA weights; the reference has no
    training pipeline at all, SURVEY.md §0).

    Chain it AFTER the optimizer proper::

        tx = optax.chain(masked_freeze(optax.adamw(sched), mask),
                         params_ema(0.999, mask=mask))

    The EMA tree lives inside ``opt_state``, so checkpoint/exact-resume
    (save_train_state) and GSPMD shardings (opt_state inherits the params')
    cover it with zero extra plumbing; pull it out with
    :func:`extract_ema`. Updates pass through unchanged.

    ``mask`` (the trainable mask): frozen leaves carry NO copy and NO
    per-step arithmetic — their state leaf is a zero-size sentinel (an
    alias of the param would be donated twice under donate_argnums) and
    :func:`extract_ema` reconstructs them from the live params. Without
    the mask, a QLoRA run would duplicate the frozen int8 7B base into
    opt_state (~6.5 GB of dead HBM) just to EMA-average constants. The
    extracted tree is identical either way: the EMA of a frozen leaf IS
    the leaf.
    """
    import optax

    mleaves = None if mask is None else jax.tree.leaves(mask)

    def _masked(fn_tracked, fn_frozen, *trees):
        leaves = [jax.tree.leaves(t) for t in trees]
        m = mleaves if mleaves is not None else [True] * len(leaves[0])
        out = [
            (fn_tracked if mi else fn_frozen)(*xs)
            for mi, *xs in zip(m, *leaves)
        ]
        return jax.tree.unflatten(jax.tree.structure(trees[0]), out)

    def init(params):
        # tracked leaves: a REAL copy (jnp.asarray would alias the param
        # buffers, and an aliased ema makes donate_argnums=(0,1) donate the
        # same buffer twice — XLA rejects the execute). Frozen leaves:
        # EMA_SENTINEL (see extract_ema).
        ema = _masked(
            lambda p: jnp.array(p, copy=True),
            lambda p: _ema_sentinel(), params,
        )
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
        ema = _masked(
            lambda e, p: (d * e.astype(jnp.float32)
                          + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
            lambda e, p: e,  # frozen: the sentinel rides along
            state["ema"], new_params,
        )
        return updates, {"ema": ema, "count": count}

    return optax.GradientTransformation(init, update)


def _ema_sentinel():
    """Zero-size stand-in for frozen leaves in a mask-aware params_ema
    state: shaped () int8 — no real parameter here is a 0-d int8 scalar.
    Built lazily so importing this module never initializes the backend
    (dryrun_multichip must set the platform first)."""
    return jnp.zeros((), jnp.int8)


def _is_ema_sentinel(x) -> bool:
    return getattr(x, "shape", None) == () and x.dtype == jnp.int8


def extract_ema(opt_state, params=None):
    """Pull the EMA parameter tree from an opt_state produced by a chain
    containing :func:`params_ema` (searched by the state's dict shape).
    When params_ema was built with a ``mask``, frozen leaves are sentinels;
    pass the live ``params`` to substitute them (their EMA is the leaf
    itself)."""
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
    ema = found[0]
    has_sentinel = any(_is_ema_sentinel(x) for x in jax.tree.leaves(ema))
    if not has_sentinel:
        return ema
    if params is None:
        raise ValueError(
            "mask-aware params_ema state: pass the live params to "
            "extract_ema so frozen leaves can be reconstructed"
        )
    return jax.tree.map(
        lambda e, p: p if _is_ema_sentinel(e) else e, ema, params
    )
