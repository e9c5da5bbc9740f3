"""HF PaliGemma loader (parity surface: reference
src/model/paligemma/load.py — config.json + safetensors -> model)."""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp

from blurr_tpu.models.paligemma.config import PaliGemmaConfig
from blurr_tpu.models.paligemma.model import PaliGemmaForConditionalGeneration
from blurr_tpu.models.pi0.checkpoint import (
    _mixture_params_from_torch,
    _siglip_params_from_torch,
    _t,
    jnp_cast,
    load_safetensors_dir,
)


def load_hf_model(
    model_path: str, dtype=jnp.bfloat16
) -> Tuple[PaliGemmaForConditionalGeneration, dict]:
    """(model, params) from a local PaliGemma HF snapshot directory."""
    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    config = PaliGemmaConfig(**raw)
    model = PaliGemmaForConditionalGeneration(config)

    state = load_safetensors_dir(model_path)
    params = {
        "embed_tokens": _t(state["language_model.model.embed_tokens.weight"]),
        "siglip": _siglip_params_from_torch(state, "vision_tower.vision_model."),
        "projector": {
            "w": _t(state["multi_modal_projector.linear.weight"]).T,
            "b": _t(state["multi_modal_projector.linear.bias"]),
        },
        "joint": {
            "vlm": _mixture_params_from_torch(state, "language_model.model.")
        },
    }
    return model, jnp_cast(params, dtype)
