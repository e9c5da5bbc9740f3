"""SigLIP vision tower + PaliGemma projector, TPU-native.

Functional re-design of the reference tower (reference
src/model/paligemma/siglip.py): parameters live in a pytree with layer weights
stacked on a leading [L, ...] axis and the encoder runs as one
``jax.lax.scan``, so the 27-layer tower compiles to a single fused loop.

The patch embedding (stride == kernel conv) is expressed as patchify-reshape +
matmul, which maps directly onto the MXU instead of going through a conv
lowering. Images are handled in NHWC internally (TPU-preferred layout); the
public API accepts NCHW for parity with the reference processor.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import mha_flat
from blurr_tpu.ops.norms import layer_norm
from blurr_tpu.ops.quant import mm


def init_siglip_params(rng: jax.Array, cfg: Dict, dtype=jnp.float32) -> Dict:
    """Random-init parameter pytree matching the reference tower's shapes."""
    d = cfg["hidden_size"]
    inter = cfg["intermediate_size"]
    nl = cfg["num_hidden_layers"]
    p = cfg["patch_size"]
    c = cfg["num_channels"]
    n_patches = (cfg["image_size"] // p) ** 2

    keys = iter(jax.random.split(rng, 16))

    def dense(key, fan_in, shape):
        return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

    def stack(key, fan_in, shape):
        return dense(key, fan_in, (nl, *shape))

    params = {
        "patch_w": dense(next(keys), p * p * c, (p * p * c, d)),
        "patch_b": jnp.zeros((d,), dtype),
        "pos_embed": dense(next(keys), d, (n_patches, d)),
        "layers": {
            "ln1_w": jnp.ones((nl, d), dtype),
            "ln1_b": jnp.zeros((nl, d), dtype),
            "ln2_w": jnp.ones((nl, d), dtype),
            "ln2_b": jnp.zeros((nl, d), dtype),
            "q_w": stack(next(keys), d, (d, d)),
            "q_b": jnp.zeros((nl, d), dtype),
            "k_w": stack(next(keys), d, (d, d)),
            "k_b": jnp.zeros((nl, d), dtype),
            "v_w": stack(next(keys), d, (d, d)),
            "v_b": jnp.zeros((nl, d), dtype),
            "out_w": stack(next(keys), d, (d, d)),
            "out_b": jnp.zeros((nl, d), dtype),
            "fc1_w": stack(next(keys), d, (d, inter)),
            "fc1_b": jnp.zeros((nl, inter), dtype),
            "fc2_w": stack(next(keys), inter, (inter, d)),
            "fc2_b": jnp.zeros((nl, d), dtype),
        },
        "post_ln_w": jnp.ones((d,), dtype),
        "post_ln_b": jnp.zeros((d,), dtype),
    }
    return params


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[B, C, H, W] (NCHW, parity layout) -> [B, N, patch*patch*C] with the
    flattened ordering (pi, pj, c) matching the conv-as-matmul weight layout."""
    b, c, h, w = pixel_values.shape
    nh, nw = h // patch_size, w // patch_size
    x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NHWC
    x = x.reshape(b, nh, patch_size, nw, patch_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [B, nh, nw, p, p, C]
    return x.reshape(b, nh * nw, patch_size * patch_size * c)


def siglip_forward(
    params: Dict,
    pixel_values: jax.Array,
    cfg: Dict,
    remat: bool = False,
    sp_axis=None,
) -> jax.Array:
    """[B, C, H, W] -> [B, N_patches, hidden]. ``remat`` checkpoints the
    scanned layer for the training backward (27 layers of [B, 256, 1152+]
    activations dominate the train-step HBM at batch >= 16 once the joint
    stack is rematerialized — measured in docs/results/remat_memory_v5e.csv).
    ``sp_axis`` sequence-shards the patch tokens over that mesh axis (GSPMD
    SP; see parallel/mesh.py:sp_constrain) — attention all-gathers K/V, the
    LN/MLP work splits 1/n per device."""
    d = cfg["hidden_size"]
    num_heads = cfg["num_attention_heads"]
    head_dim = d // num_heads
    eps = float(cfg.get("layer_norm_eps", 1e-6))
    p = cfg["patch_size"]

    patches = patchify(pixel_values, p)
    h = patches @ params["patch_w"] + params["patch_b"]
    h = h + params["pos_embed"][None]
    if sp_axis is not None:
        from blurr_tpu.parallel.mesh import sp_constrain

        h = sp_constrain(h, sp_axis)

    def split_heads(x):  # [B, S, D] -> [B, S, H, hd] (flat-attn layout)
        b, s, _ = x.shape
        return x.reshape(b, s, num_heads, head_dim)

    def layer(h, lp):
        resid = h
        x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)
        q = split_heads(mm(x, lp["q_w"]) + lp["q_b"])
        k = split_heads(mm(x, lp["k_w"]) + lp["k_b"])
        v = split_heads(mm(x, lp["v_w"]) + lp["v_b"])
        attn = mha_flat(q, k, v)
        h = resid + (mm(attn, lp["out_w"]) + lp["out_b"])
        resid = h
        x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
        x = jax.nn.gelu(mm(x, lp["fc1_w"]) + lp["fc1_b"], approximate=True)
        h = resid + (mm(x, lp["fc2_w"]) + lp["fc2_b"])
        if sp_axis is not None:
            from blurr_tpu.parallel.mesh import sp_constrain

            h = sp_constrain(h, sp_axis)  # keep the scan carry token-sharded
        return h, None

    layer_fn = jax.checkpoint(layer) if remat else layer
    h, _ = jax.lax.scan(layer_fn, h, params["layers"])
    return layer_norm(h, params["post_ln_w"], params["post_ln_b"], eps)


def init_projector_params(rng: jax.Array, cfg: Dict, dtype=jnp.float32) -> Dict:
    """PaliGemma multi-modal projector: single linear 1152 -> 2048
    (reference siglip.py:9-31)."""
    vc = cfg["vision_config"]
    din, dout = vc["hidden_size"], vc["projection_dim"]
    w = jax.random.normal(rng, (din, dout), dtype) * (din**-0.5)
    return {"w": w, "b": jnp.zeros((dout,), dtype)}


def projector_forward(params: Dict, image_features: jax.Array) -> jax.Array:
    return image_features @ params["w"] + params["b"]


from blurr_tpu.config.core import register


@register("SiglipVisionModel")
class SiglipVisionModel:
    """Thin OO wrapper for registry instantiation parity."""

    def __init__(self, config):
        self.config = dict(config)

    def init(self, rng, dtype=jnp.float32):
        return init_siglip_params(rng, self.config, dtype)

    def __call__(self, params, pixel_values):
        return siglip_forward(params, pixel_values, self.config)


@register("PaliGemmaMultiModalProjector")
class PaliGemmaMultiModalProjector:
    def __init__(self, config):
        self.config = dict(config)

    def init(self, rng, dtype=jnp.float32):
        return init_projector_params(rng, self.config, dtype)

    def __call__(self, params, image_features):
        return projector_forward(params, image_features)
