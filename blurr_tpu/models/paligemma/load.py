"""HF PaliGemma loader (parity surface: reference
src/model/paligemma/load.py — config.json + safetensors -> model)."""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp

from blurr_tpu.models.paligemma.config import PaliGemmaConfig
from blurr_tpu.models.paligemma.model import PaliGemmaForConditionalGeneration
from blurr_tpu.models.pi0.checkpoint import paligemma_params_from_safetensors


def load_hf_model(
    model_path: str, dtype=jnp.bfloat16
) -> Tuple[PaliGemmaForConditionalGeneration, dict]:
    """(model, params) from a local PaliGemma HF snapshot directory."""
    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    config = PaliGemmaConfig(**raw)
    model = PaliGemmaForConditionalGeneration(config)

    # key remaps live in ONE place: the pi0 checkpoint bridge
    return model, paligemma_params_from_safetensors(model_path, dtype)
