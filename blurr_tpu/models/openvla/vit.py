"""Generic ViT encoder for the prismatic/OpenVLA vision backbones.

Covers both timm towers OpenVLA fuses (reference loads them through
trust_remote_code, scripts/eval_hf_vla_simpler.py:729-737):
- DINOv2 ViT-L/14 w/ 4 register tokens + LayerScale (vit_large_patch14_reg4)
- SigLIP ViT-So400m/14 (no cls token, attention/out biases)

Prismatic reads the PENULTIMATE block's output (feature_layer=-2) and drops
cls/register tokens. Layers are scan-stacked like the Pi-0 towers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import mha_flat
from blurr_tpu.ops.norms import layer_norm


@dataclass(frozen=True)
class ViTSpec:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    patch_size: int = 14
    image_size: int = 224
    num_channels: int = 3
    cls_token: bool = False
    reg_tokens: int = 0
    layerscale: bool = False
    feature_layer: int = -2  # prismatic: penultimate block output
    eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.cls_token else 0) + self.reg_tokens

    @property
    def effective_num_layers(self) -> int:
        """Blocks actually executed: prismatic's feature_layer=-2 means the
        last block is never run, so its weights are not even stored (slicing
        a stacked tree inside jit would copy it)."""
        if self.feature_layer < 0:
            return self.num_layers + self.feature_layer + 1
        return self.feature_layer + 1


def init_vit_params(rng: jax.Array, spec: ViTSpec, dtype=jnp.float32) -> Dict:
    d, inter, nl = spec.hidden_size, spec.intermediate_size, spec.effective_num_layers
    p, c = spec.patch_size, spec.num_channels
    keys = iter(jax.random.split(rng, 8))

    def dense(key, fan_in, shape):
        return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

    params = {
        "patch_w": dense(next(keys), p * p * c, (p * p * c, d)),
        "patch_b": jnp.zeros((d,), dtype),
        # register models (timm no_embed_class) store a patches-only pos
        # table; plain towers cover [cls] + patches. vit_forward dispatches
        # on the row count, so bridged checkpoints of either layout work.
        "pos_embed": dense(
            next(keys),
            d,
            (
                spec.num_patches
                if spec.reg_tokens
                else (1 if spec.cls_token else 0) + spec.num_patches,
                d,
            ),
        ),
        "layers": {
            "ln1_w": jnp.ones((nl, d), dtype),
            "ln1_b": jnp.zeros((nl, d), dtype),
            "ln2_w": jnp.ones((nl, d), dtype),
            "ln2_b": jnp.zeros((nl, d), dtype),
            "qkv_w": dense(next(keys), d, (nl, d, 3 * d)),
            "qkv_b": jnp.zeros((nl, 3 * d), dtype),
            "out_w": dense(next(keys), d, (nl, d, d)),
            "out_b": jnp.zeros((nl, d), dtype),
            "fc1_w": dense(next(keys), d, (nl, d, inter)),
            "fc1_b": jnp.zeros((nl, inter), dtype),
            "fc2_w": dense(next(keys), inter, (nl, inter, d)),
            "fc2_b": jnp.zeros((nl, d), dtype),
        },
    }
    if spec.cls_token:
        params["cls_token"] = jnp.zeros((1, 1, d), dtype)
    if spec.reg_tokens:
        params["reg_tokens"] = jnp.zeros((1, spec.reg_tokens, d), dtype)
    if spec.layerscale:
        params["layers"]["ls1"] = jnp.full((nl, d), 1e-5, dtype)
        params["layers"]["ls2"] = jnp.full((nl, d), 1e-5, dtype)
    return params


# one patch-flatten implementation repo-wide: the (pi, pj, c) ordering must
# stay matched to both checkpoint bridges' conv-as-matmul weight reshape
from blurr_tpu.models.pi0.siglip import patchify as _patchify  # noqa: E402


def vit_forward(
    params: Dict, pixel_values: jax.Array, spec: ViTSpec
) -> jax.Array:
    """[B, C, H, W] -> patch features [B, num_patches, hidden] from the
    ``feature_layer`` block (cls/register tokens dropped)."""
    d = spec.hidden_size
    nh = spec.num_heads
    hd = d // nh

    h = _patchify(pixel_values, spec.patch_size) @ params["patch_w"] + params["patch_b"]
    b = h.shape[0]
    pos = params["pos_embed"]
    if pos.shape[0] == spec.num_patches:
        # timm no_embed_class layout (register models, e.g.
        # vit_large_patch14_reg4_dinov2): pos table covers PATCHES only —
        # added before the prefix tokens, which get no position embedding
        # (timm's dinov2 converter folds the cls pos row into cls_token).
        # Prefix order is (cls, reg, patches) like timm's _pos_embed.
        h = h + pos[None].astype(h.dtype)
        prefix = []
        if spec.cls_token:
            prefix.append(
                jnp.broadcast_to(params["cls_token"], (b, 1, d)).astype(h.dtype)
            )
        if spec.reg_tokens:
            prefix.append(
                jnp.broadcast_to(
                    params["reg_tokens"], (b, spec.reg_tokens, d)
                ).astype(h.dtype)
            )
        if prefix:
            h = jnp.concatenate(prefix + [h], axis=1)
    else:
        # embed-class layout: pos table covers [cls] + patches
        if spec.cls_token:
            cls = jnp.broadcast_to(params["cls_token"], (b, 1, d)).astype(h.dtype)
            h = jnp.concatenate([cls, h], axis=1)
        h = h + pos[None].astype(h.dtype)
        if spec.reg_tokens:
            # register tokens appended after pos-embed, before blocks
            reg = jnp.broadcast_to(
                params["reg_tokens"], (b, spec.reg_tokens, d)
            ).astype(h.dtype)
            h = (
                jnp.concatenate([h[:, :1], reg, h[:, 1:]], axis=1)
                if spec.cls_token
                else jnp.concatenate([reg, h], axis=1)
            )

    layers = params["layers"]  # already truncated to effective_num_layers

    def split(x):  # flat-attn layout [B, S, H, hd]
        bb, s, _ = x.shape
        return x.reshape(bb, s, nh, hd)

    def block(h, lp):
        x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], spec.eps)
        qkv = x @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = mha_flat(split(q), split(k), split(v))
        a = a @ lp["out_w"] + lp["out_b"]
        if spec.layerscale:
            a = a * lp["ls1"]
        h = h + a
        x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], spec.eps)
        x = jax.nn.gelu(x @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        x = x @ lp["fc2_w"] + lp["fc2_b"]
        if spec.layerscale:
            x = x * lp["ls2"]
        return h + x, None

    h, _ = jax.lax.scan(block, h, layers)
    return h[:, spec.num_prefix_tokens :]
