"""Standalone PaliGemma conditional generation (parity surface: reference
src/model/paligemma/gemma.py — GemmaForCausalLM +
PaliGemmaForConditionalGeneration).

TPU-native design: reuses the joint engine's single-mixture path (the Gemma
decoder stack with Gemma RMSNorm/RoPE semantics) with a preallocated KV
buffer; generation is greedy prefill + per-token decode, the same machinery
PiZero.infer_text uses. Weights load from PaliGemma safetensors through the
checkpoint bridge.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.models.paligemma.config import PaliGemmaConfig
from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.models.pi0.joint import JointSpec, MixtureSpec
from blurr_tpu.models.pi0.siglip import (
    init_projector_params,
    init_siglip_params,
    projector_forward,
    siglip_forward,
)


class PaliGemmaForConditionalGeneration:
    def __init__(self, config: PaliGemmaConfig):
        self.config = config
        tc = config.text_config
        self.joint_spec = JointSpec(
            num_hidden_layers=tc.num_hidden_layers,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            head_dim=tc.head_dim,
            rms_norm_eps=tc.rms_norm_eps,
            # Gemma-1 applies NO attention soft-clamp: the reference's
            # standalone GemmaAttention computes plain scaled-dot-product
            # (gemma.py:92-107), unlike its VLA mixture path which clamps at
            # 50 (joint_model.py:272-288, the pi0 training-time semantics)
            use_softclamp=False,
            mixtures={
                "vlm": MixtureSpec(
                    hidden_size=tc.hidden_size,
                    intermediate_size=tc.intermediate_size,
                    rope_theta=tc.rope_theta,
                    use_final_norm=True,
                )
            },
        )
        self.vision_cfg = config.vision_config.to_dict()

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> Dict:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        h = self.config.text_config.hidden_size
        return {
            "embed_tokens": jax.random.normal(
                k1, (self.config.text_config.vocab_size, h), dtype
            )
            * (h**-0.5),
            "siglip": init_siglip_params(k2, self.vision_cfg, dtype),
            "projector": init_projector_params(
                k3,
                {
                    "vision_config": {
                        "hidden_size": self.vision_cfg["hidden_size"],
                        "projection_dim": self.config.projection_dim,
                    }
                },
                dtype,
            ),
            "joint": {
                "vlm": joint_lib.init_mixture_params(
                    k4, self.joint_spec.mixtures["vlm"], self.joint_spec, dtype
                )
            },
        }

    # ------------------------------------------------------------------

    def _merge_embeds(self, params, input_ids, pixel_values):
        """Scaled image features at image-token slots (same embed-merge as
        PiZero; PaliGemma places image tokens first)."""
        cfg = self.config
        text_embeds = params["embed_tokens"][input_ids]
        feats = siglip_forward(params["siglip"], pixel_values, self.vision_cfg)
        feats = projector_forward(params["projector"], feats)
        feats = feats / jnp.asarray(cfg.hidden_size**0.5, feats.dtype)
        n_img = feats.shape[1]
        text_mask = (input_ids != cfg.image_token_index) & (
            input_ids != (cfg.pad_token_id or 0)
        )
        merged = jnp.where(text_mask[..., None], text_embeds, 0.0)
        img_mask = (input_ids[:, :n_img] == cfg.image_token_index)[..., None]
        head = jnp.where(img_mask, feats.astype(merged.dtype), merged[:, :n_img])
        return jnp.concatenate([head, merged[:, n_img:]], axis=1)

    def prefill(
        self, params: Dict, input_ids: jax.Array, pixel_values: jax.Array,
        max_cache_len: int,
    ) -> Tuple[jax.Array, Tuple, jax.Array]:
        bsz, q_len = input_ids.shape
        embeds = self._merge_embeds(params, input_ids, pixel_values)
        pos = jnp.broadcast_to(
            jnp.arange(1, q_len + 1, dtype=jnp.int32)[None], (bsz, q_len)
        )
        cache = joint_lib.alloc_single_cache(
            self.joint_spec, bsz, max_cache_len, embeds.dtype
        )
        cols = jnp.arange(max_cache_len)[None, None, :]
        mask = jnp.broadcast_to(cols < q_len, (bsz, q_len, max_cache_len))
        hidden, cache = joint_lib.single_forward(
            params["joint"], self.joint_spec, "vlm", embeds, pos, mask,
            cache=cache, cache_len=jnp.int32(0),
        )
        # project only the LAST position through the 257k-vocab tied head
        # (a full-prompt [B, S, V] projection is ~155 MB + 316 GFLOP of
        # waste; generation uses logits[:, -1] only)
        logits = hidden[:, -1:] @ params["embed_tokens"].T
        return logits, cache, jnp.int32(q_len)

    def decode_step(self, params: Dict, token: jax.Array, cache, cache_len):
        if token.ndim == 1:
            token = token[:, None]
        bsz = token.shape[0]
        embeds = params["embed_tokens"][token]
        pos = jnp.broadcast_to(cache_len[None, None] + 1, (bsz, 1)).astype(jnp.int32)
        max_len = cache[0].shape[3]
        cols = jnp.arange(max_len)[None, None, :]
        mask = jnp.broadcast_to(cols <= cache_len, (bsz, 1, max_len))
        hidden, cache = joint_lib.single_forward(
            params["joint"], self.joint_spec, "vlm", embeds, pos, mask,
            cache=cache, cache_len=cache_len,
        )
        logits = hidden @ params["embed_tokens"].T
        return jnp.argmax(logits[:, -1], axis=-1), cache, cache_len + 1

    def _jitted(self, key, make):
        """Per-instance jit cache: re-wrapping a method in jax.jit on every
        generate() call would recompile each time (~15s/program over the
        axon tunnel; the persistent cache does not help)."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        if key not in cache:
            cache[key] = make()
        return cache[key]

    def generate(
        self, params: Dict, input_ids, pixel_values, max_new_tokens: int = 20,
        eos_token_id: Optional[int] = None,
    ) -> np.ndarray:
        """Greedy generation with host-side EOS early stop."""
        input_ids = jnp.asarray(input_ids)
        pixel_values = jnp.asarray(pixel_values)
        max_len = input_ids.shape[1] + max_new_tokens
        prefill = self._jitted("prefill", lambda: jax.jit(self.prefill, static_argnums=(3,)))
        step = self._jitted("decode", lambda: jax.jit(self.decode_step))
        logits, cache, cache_len = prefill(params, input_ids, pixel_values, max_len)
        tok = jnp.argmax(logits[:, -1], axis=-1)
        out = [np.asarray(tok)]
        done = (out[-1] == eos_token_id) if eos_token_id is not None else None
        for _ in range(max_new_tokens - 1):
            # per-row early stop: break only when EVERY row has emitted EOS;
            # finished rows keep repeating EOS (matches generate_fused)
            if done is not None and done.all():
                break
            tok, cache, cache_len = step(params, tok, cache, cache_len)
            nxt = np.asarray(tok)
            if done is not None:
                nxt = np.where(done, eos_token_id, nxt)
                done = done | (nxt == eos_token_id)
                tok = jnp.asarray(nxt)
            out.append(nxt)
        return np.stack(out, axis=1)  # [B, T]

    def generate_fused(
        self, params: Dict, input_ids, pixel_values, max_new_tokens: int = 20,
        eos_token_id: Optional[int] = None,
    ) -> np.ndarray:
        """Greedy generation as ONE jitted program: prefill + lax.scan over
        decode steps (the per-token host dispatch of ``generate`` costs a
        device round-trip per token — significant over remote TPU links).
        EOS handling: once emitted, subsequent positions repeat EOS."""
        input_ids = jnp.asarray(input_ids)
        pixel_values = jnp.asarray(pixel_values)
        q_len = input_ids.shape[1]
        max_len = q_len + max_new_tokens
        eos = -1 if eos_token_id is None else int(eos_token_id)

        def run(params, input_ids, pixel_values):
            logits, cache, cache_len = self.prefill(
                params, input_ids, pixel_values, max_len
            )
            tok = jnp.argmax(logits[:, -1], axis=-1)
            done = tok == eos

            # carry: (tok, cache, cache_len, done); collect emitted tokens
            def step2(carry, _):
                tok, cache, cache_len, done = carry
                nxt, cache, cache_len = self.decode_step(
                    params, tok, cache, cache_len
                )
                nxt = jnp.where(done, jnp.full_like(nxt, eos), nxt)
                done = done | (nxt == eos)
                return (nxt, cache, cache_len, done), tok

            (last, _, _, _), toks = jax.lax.scan(
                step2, (tok, cache, cache_len, done), None,
                length=max_new_tokens - 1,
            )
            toks = jnp.moveaxis(toks, 0, 1)
            return jnp.concatenate([toks, last[:, None]], axis=1)

        fused = self._jitted(("fused", max_len, eos), lambda: jax.jit(run))
        return np.asarray(fused(params, input_ids, pixel_values))


class GemmaForCausalLM:
    """Text-only Gemma causal LM (parity surface: reference
    src/model/paligemma/gemma.py:252-291) — the PaliGemma stack without the
    vision tower; lm_head tied to the embedding."""

    def __init__(self, config):
        # accepts a GemmaConfig or PaliGemmaConfig
        text = getattr(config, "text_config", config)
        from blurr_tpu.models.paligemma.config import PaliGemmaConfig

        text_dict = {k: v for k, v in text.to_dict().items() if k != "pad_token_id"}
        wrapper = PaliGemmaConfig(
            text_config=text_dict,
            vision_config={"hidden_size": 8, "intermediate_size": 8,
                           "num_hidden_layers": 1, "num_attention_heads": 1,
                           "image_size": 14, "patch_size": 14},
            image_token_index=-1,  # never matches -> pure text path
            pad_token_id=text.pad_token_id,
            hidden_size=text.hidden_size,
            projection_dim=text.hidden_size,
        )
        self._inner = PaliGemmaForConditionalGeneration(wrapper)
        self.config = text

    _jitted = PaliGemmaForConditionalGeneration._jitted

    def init_params(self, rng, dtype=jnp.float32):
        params = self._inner.init_params(rng, dtype)
        return {k: v for k, v in params.items() if k not in ("siglip", "projector")}

    def prefill(self, params, input_ids, max_cache_len):
        """Pure-text prefill: embeds straight from the table."""
        bsz, q_len = input_ids.shape
        embeds = params["embed_tokens"][input_ids]
        pos = jnp.broadcast_to(
            jnp.arange(1, q_len + 1, dtype=jnp.int32)[None], (bsz, q_len)
        )
        cache = joint_lib.alloc_single_cache(
            self._inner.joint_spec, bsz, max_cache_len, embeds.dtype
        )
        cols = jnp.arange(max_cache_len)[None, None, :]
        mask = jnp.broadcast_to(cols < q_len, (bsz, q_len, max_cache_len))
        hidden, cache = joint_lib.single_forward(
            params["joint"], self._inner.joint_spec, "vlm", embeds, pos, mask,
            cache=cache, cache_len=jnp.int32(0),
        )
        logits = hidden[:, -1:] @ params["embed_tokens"].T  # last position only
        return logits, cache, jnp.int32(q_len)

    def decode_step(self, params, token, cache, cache_len):
        return self._inner.decode_step(params, token, cache, cache_len)

    def generate(self, params, input_ids, max_new_tokens=20, eos_token_id=None):
        input_ids = jnp.asarray(input_ids)
        max_len = input_ids.shape[1] + max_new_tokens
        prefill = self._jitted("prefill", lambda: jax.jit(self.prefill, static_argnums=(2,)))
        logits, cache, cache_len = prefill(params, input_ids, max_len)
        step = self._jitted("decode", lambda: jax.jit(self.decode_step))
        tok = jnp.argmax(logits[:, -1], axis=-1)
        out = [np.asarray(tok)]
        done = (out[-1] == eos_token_id) if eos_token_id is not None else None
        for _ in range(max_new_tokens - 1):
            if done is not None and done.all():  # per-row early stop
                break
            tok, cache, cache_len = step(params, tok, cache, cache_len)
            nxt = np.asarray(tok)
            if done is not None:
                nxt = np.where(done, eos_token_id, nxt)
                done = done | (nxt == eos_token_id)
                tok = jnp.asarray(nxt)
            out.append(nxt)
        return np.stack(out, axis=1)
