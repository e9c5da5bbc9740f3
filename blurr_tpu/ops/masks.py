"""Block-attention mask and position-id construction for Pi-0.

The reference builds a materialized additive float mask [B, 1, S, S] on the
host every control step (reference src/model/vla/pizero.py:328-393). Here the
masks are boolean, computed in-graph from the token-validity vector
``attention_mask`` [B, max_image_text_tokens] — a few broadcasted-iota
compares that XLA fuses into the attention, so the host never touches them.

Block layout (T = max_image_text_tokens + num_proprio + num_action):

             img/text img/text img/text (padding) proprio action action
    img/text    x        x        x
    img/text    x        x        x
    img/text    x        x        x
    (padding)
    proprio     x        x        x                 x
    action      x        x        x                 x       x      x
    action      x        x        x                 x       x      x

Padding rows are fully masked; with finfo-min masking the softmax over such a
row is uniform (finite), matching the reference's NaN-avoidance trick.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _iota(n: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]


def image_text_counts(attention_mask: jax.Array) -> jax.Array:
    """Number of valid image+text tokens per batch element: [B] int32."""
    return jnp.sum(attention_mask.astype(jnp.int32), axis=1)


def pi0_full_mask(
    attention_mask: jax.Array,
    max_image_text_tokens: int,
    num_proprio_tokens: int,
    num_action_tokens: int,
) -> jax.Array:
    """Full block-causal boolean mask [B, T, T] (True = may attend)."""
    p_start = max_image_text_tokens
    p_end = p_start + num_proprio_tokens
    total = p_end + num_action_tokens
    cnt = image_text_counts(attention_mask)[:, None, None]  # [B,1,1]
    r = _iota(total)[None, :, None]  # [1,T,1]
    c = _iota(total)[None, None, :]  # [1,1,T]

    img_self = (r < cnt) & (c < cnt)
    suffix_to_img = (r >= p_start) & (c < cnt)
    proprio_self = (r >= p_start) & (r < p_end) & (c >= p_start) & (c < p_end)
    action_rows = (r >= p_end) & (c >= p_start) & (c < total)
    return img_self | suffix_to_img | proprio_self | action_rows


def pi0_prefix_mask(
    attention_mask: jax.Array,
    max_image_text_tokens: int,
    num_proprio_tokens: int,
) -> jax.Array:
    """Prefill mask [B, P, P] over image/text + proprio (P = img_text + proprio);
    equals the top-left block of the full mask (reference
    split_full_mask_into_submasks, pizero.py:383-393)."""
    p_start = max_image_text_tokens
    p_end = p_start + num_proprio_tokens
    cnt = image_text_counts(attention_mask)[:, None, None]
    r = _iota(p_end)[None, :, None]
    c = _iota(p_end)[None, None, :]
    img_self = (r < cnt) & (c < cnt)
    suffix_to_img = (r >= p_start) & (c < cnt)
    proprio_self = (r >= p_start) & (c >= p_start)
    return img_self | suffix_to_img | proprio_self


def pi0_action_mask(
    attention_mask: jax.Array,
    max_image_text_tokens: int,
    num_proprio_tokens: int,
    num_action_tokens: int,
) -> jax.Array:
    """Decode mask [B, A, T]: action queries over the full key sequence
    (valid image/text, proprio, action); the bottom rows of the full mask."""
    p_start = max_image_text_tokens
    total = p_start + num_proprio_tokens + num_action_tokens
    cnt = image_text_counts(attention_mask)[:, None, None]
    c = _iota(total)[None, None, :]  # [1,1,T]
    row = (c < cnt) | (c >= p_start)
    return jnp.broadcast_to(row, (attention_mask.shape[0], num_action_tokens, total))


def pi0_position_ids(
    batch_size: int,
    max_image_text_tokens: int,
    num_proprio_tokens: int,
    num_action_tokens: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-mixture RoPE position ids, all starting at 1; action continues
    after proprio since they share mixture weights (pizero.py:369-381)."""

    def rep(lo, hi):
        ids = jnp.arange(lo, hi, dtype=jnp.int32)[None, :]
        return jnp.broadcast_to(ids, (batch_size, hi - lo))

    vlm = rep(1, max_image_text_tokens + 1)
    proprio = rep(1, num_proprio_tokens + 1)
    action = rep(
        num_proprio_tokens + 1, num_proprio_tokens + num_action_tokens + 1
    )
    return vlm, proprio, action


def additive_from_bool(mask: jax.Array, dtype) -> jax.Array:
    """Parity helper: boolean [B, Q, K] -> additive float [B, 1, Q, K] with 0
    where allowed and finfo(dtype).min where masked (the reference's exact
    host-side mask format)."""
    big_neg = jnp.finfo(dtype).min
    add = jnp.where(mask, jnp.zeros((), dtype), jnp.full((), big_neg, dtype))
    return add[:, None, :, :]
