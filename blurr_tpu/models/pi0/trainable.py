"""Trainable-parameter selection for Pi-0 fine-tuning.

The reference freezes torch modules in place (freeze_all_weights /
freeze_unused_weights / trainable_vlm_parameters etc., reference
pizero.py:122-268). The functional analogue is a boolean mask pytree usable
with optax.masked / optax.multi_transform: True = trainable.
"""

from __future__ import annotations

from typing import Dict

import jax


def _mask_like(params, value: bool):
    return jax.tree.map(lambda _: value, params)


def _subtrees_tied(a, b) -> bool:
    """True when ``a`` IS ``b`` or every leaf of ``a`` is the same array
    object as the corresponding leaf of ``b``. tie_action_proprio_weights
    aliases the proprio mixture to the action arrays; sharding/device_put
    rebuilds the dicts (so subtree identity breaks) while
    parallel.mesh.shard_params keeps the LEAVES aliased — detect the tie at
    the level that survives."""
    if a is b:
        return True
    if a is None or b is None:
        return False
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return bool(la) and len(la) == len(lb) and all(x is y for x, y in zip(la, lb))


def action_expert_mask(params: Dict) -> Dict:
    """Trainable = action mixture + action/proprio encoders + decoder
    (reference action_expert_parameters, pizero.py:122-129)."""
    mask = _mask_like(params, False)
    for key in ("action_encoder", "proprio_encoder", "action_decoder"):
        mask[key] = _mask_like(params[key], True)
    mask["joint"]["action"] = _mask_like(params["joint"]["action"], True)
    if _subtrees_tied(params["joint"].get("proprio"), params["joint"].get("action")):
        mask["joint"]["proprio"] = mask["joint"]["action"]
    return mask


def vlm_mask(params: Dict, include_last_layer_tail: bool = False) -> Dict:
    """Trainable = vision tower + projector + vlm mixture. When
    ``include_last_layer_tail`` is False, mirrors the reference's
    _check_gemma_unused_parameter_by_name (pizero.py:232-242): the final
    layer's post-attention weights (o/v proj, MLP, post norm) never affect
    the cached K/V, so they stay frozen. With stacked [L,...] weights that
    filter is per-layer-slice, which a boolean mask cannot express — the
    gradient of those slices is identically zero through the prefill path,
    so masking is unnecessary there."""
    mask = _mask_like(params, False)
    mask["siglip"] = _mask_like(params["siglip"], True)
    mask["projector"] = _mask_like(params["projector"], True)
    mask["joint"]["vlm"] = _mask_like(params["joint"]["vlm"], True)
    return mask


def all_trainable_mask(params: Dict) -> Dict:
    return _mask_like(params, True)


def frozen_mask(params: Dict) -> Dict:
    """freeze_all_weights analogue."""
    return _mask_like(params, False)
