"""TPU-native compute primitives (pure JAX + Pallas kernels)."""

from blurr_tpu.ops.activations import gelu_tanh, silu
from blurr_tpu.ops.attention import grouped_attention
from blurr_tpu.ops.embeddings import sinusoidal_pos_emb
from blurr_tpu.ops.norms import (
    adaptive_layerscale,
    adaptive_rms_norm,
    layer_norm,
    rms_norm,
)
from blurr_tpu.ops.rotary import apply_rope, rope_cos_sin

__all__ = [
    "gelu_tanh",
    "silu",
    "grouped_attention",
    "sinusoidal_pos_emb",
    "rms_norm",
    "adaptive_rms_norm",
    "adaptive_layerscale",
    "layer_norm",
    "apply_rope",
    "rope_cos_sin",
]
