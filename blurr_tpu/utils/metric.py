"""Action-accuracy metric (parity surface: reference src/utils/metric.py)."""

from typing import List, Sequence

import jax.numpy as jnp


def get_action_accuracy(
    gt,  # [Batch, Horizon, Action_Dim]
    pred,
    thresholds: Sequence[float] = (0.1, 0.2),
):
    """Fraction of (batch, horizon) entries where EVERY action dimension is
    within the threshold. Returns [len(thresholds)]."""
    diff = jnp.abs(jnp.asarray(gt) - jnp.asarray(pred)).reshape(-1, gt.shape[-1])
    accs = []
    for threshold in thresholds:
        per_step = jnp.mean((diff < threshold).astype(jnp.float32), axis=1) >= 1.0
        accs.append(jnp.mean(per_step.astype(jnp.float32)))
    return jnp.stack(accs)
