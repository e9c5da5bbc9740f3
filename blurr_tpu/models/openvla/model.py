"""OpenVLA family, TPU-native.

The reference drives OpenVLA through HF ``trust_remote_code`` and only wraps
dtype/compile/attention around ``model.predict_action``
(scripts/benchmark_hf_vla.py:141-197, eval_hf_vla_simpler.py:936). Here the
forward is native JAX (SURVEY §7.1): fused DINOv2 + SigLIP towers ->
3-layer MLP projector -> Llama-7B -> greedy decode of ``action_dim`` action
tokens in ONE jitted program, exposing predict_action-compatible semantics:

- prompt format "In: What action should the robot take to {instruction}?\nOut:"
- input sequence = [BOS] + 256 projected patch tokens + prompt tokens
  (+ trailing empty token 29871 like the remote code)
- action de-tokenization over the LAST 256 llama vocab ids:
  discretized = vocab_size(32000) - token_id, clipped to [0, 254],
  mapped through 255 uniform bin centers in [-1, 1]
- unnormalization from dataset statistics q01/q99 with the per-dim mask

The OFT variant replaces AR decode with a parallel pass over action
placeholder tokens and a continuous MLP-ResNet action head (the reference
reconstructs that head shape-driven from checkpoints,
eval_hf_vla_simpler.py:40-132 — the math here matches `_OFTActionHead`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.models.openvla import llama as llama_lib
from blurr_tpu.models.openvla.llama import LlamaSpec
from blurr_tpu.models.openvla.vit import ViTSpec, init_vit_params, vit_forward
from blurr_tpu.ops.norms import layer_norm

from blurr_tpu.models.openvla.processing import EMPTY_TOKEN  # noqa: F401 — canonical home; re-exported for back-compat

DINOV2_L = ViTSpec(
    hidden_size=1024, intermediate_size=4096, num_layers=24, num_heads=16,
    cls_token=True, reg_tokens=4, layerscale=True,
)
SIGLIP_SO400M = ViTSpec(
    hidden_size=1152, intermediate_size=4304, num_layers=27, num_heads=16,
)


@dataclass(frozen=True)
class OpenVLASpec:
    llama: LlamaSpec = field(default_factory=LlamaSpec)
    dinov2: ViTSpec = DINOV2_L
    siglip: ViTSpec = SIGLIP_SO400M
    action_dim: int = 7
    n_action_bins: int = 256
    action_token_vocab: int = 32000  # bins live in the top ids of this range
    use_fused_vision: bool = True  # DINOv2 + SigLIP; False = SigLIP only

    @property
    def vision_dim(self) -> int:
        return (self.dinov2.hidden_size if self.use_fused_vision else 0) + \
            self.siglip.hidden_size

    @staticmethod
    def from_snapshot_dir(path) -> "OpenVLASpec":
        """Spec for an HF snapshot dir: a ``blurr_spec.json`` sidecar (our
        own format — nested dataclass fields) overrides the default
        OpenVLA-7B dims. Lets non-7B variants and synthetic test snapshots
        flow through the same CLI path."""
        import json
        from pathlib import Path

        from blurr_tpu.models.openvla.vit import ViTSpec

        p = Path(path) / "blurr_spec.json"
        if not p.exists():
            return OpenVLASpec()
        d = json.loads(p.read_text())
        kw = dict(d)
        for key, cls in (("llama", LlamaSpec), ("dinov2", ViTSpec),
                         ("siglip", ViTSpec)):
            if key in kw:
                kw[key] = cls(**kw[key])
        return OpenVLASpec(**kw)

    @staticmethod
    def tiny() -> "OpenVLASpec":
        """Layer-reduced spec for tests/smoke benches."""
        return OpenVLASpec(
            llama=LlamaSpec(
                vocab_size=32064, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2,
            ),
            dinov2=ViTSpec(
                hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
                image_size=28, cls_token=True, reg_tokens=4, layerscale=True,
                feature_layer=-1,
            ),
            siglip=ViTSpec(
                hidden_size=48, intermediate_size=96, num_layers=2, num_heads=2,
                image_size=28, feature_layer=-1,
            ),
        )

    @staticmethod
    def minivla(vocab_size: int = 32064) -> "OpenVLASpec":
        """MiniVLA-style prismatic spec: SigLIP-only vision + the Qwen2.5-
        0.5B architecture MiniVLA uses as its LLM backbone (attention QKV
        biases, lm_head tied to the embedding matrix, rope theta 1e6, eps
        1e-6). The default vocab keeps the OpenVLA 32064/32000 action-token
        convention for the random-init stand-in; loading a real checkpoint
        rebuilds the spec from the embedding shape."""
        return OpenVLASpec(
            llama=LlamaSpec(
                vocab_size=vocab_size,
                hidden_size=896,
                intermediate_size=4864,
                num_layers=24,
                num_heads=14,
                num_kv_heads=2,
                rope_theta=1_000_000.0,
                eps=1e-6,
                qkv_bias=True,
                tie_word_embeddings=True,
            ),
            siglip=SIGLIP_SO400M,
            use_fused_vision=False,
        )

    @staticmethod
    def tiny_minivla() -> "OpenVLASpec":
        """Layer-reduced MiniVLA-shaped spec (SigLIP-only vision, QKV
        biases, tied lm_head) for tests that must exercise the prismatic
        code paths without full dims."""
        return OpenVLASpec(
            llama=LlamaSpec(
                vocab_size=32064, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2,
                rope_theta=1_000_000.0, eps=1e-6, qkv_bias=True,
                tie_word_embeddings=True,
            ),
            siglip=ViTSpec(
                hidden_size=48, intermediate_size=96, num_layers=2, num_heads=2,
                image_size=28, feature_layer=-1,
            ),
            use_fused_vision=False,
        )


# checkpoint-free model ids (latency work / tests) -> spec constructors;
# ONE table for the server, bench, and trainer CLIs
RANDOM_SPECS = {
    "random": OpenVLASpec.tiny,
    "random-7b": OpenVLASpec,
    "openvla-7b-random": OpenVLASpec,
    "random-minivla": OpenVLASpec.minivla,
    "minivla-random": OpenVLASpec.minivla,
    "random-minivla-tiny": OpenVLASpec.tiny_minivla,
}


class OpenVLA:
    def __init__(self, spec: OpenVLASpec, norm_stats: Optional[Dict] = None):
        self.spec = spec
        self.norm_stats = norm_stats or {}
        bins = np.linspace(-1, 1, spec.n_action_bins)
        self.bin_centers = (bins[:-1] + bins[1:]) / 2.0

    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> Dict:
        s = self.spec
        keys = iter(jax.random.split(rng, 8))
        ldim = s.llama.hidden_size

        def dense(key, fan_in, shape):
            return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

        projector = {
            "fc1_w": dense(next(keys), s.vision_dim, (s.vision_dim, ldim)),
            "fc1_b": jnp.zeros((ldim,), dtype),
            "fc2_w": dense(next(keys), ldim, (ldim, ldim)),
            "fc2_b": jnp.zeros((ldim,), dtype),
        }
        if s.use_fused_vision:
            # OpenVLA's fused-backbone projector is 3 linears; the prismatic
            # single-backbone MLP projector is Linear-GELU-Linear (2)
            projector["fc3_w"] = dense(next(keys), ldim, (ldim, ldim))
            projector["fc3_b"] = jnp.zeros((ldim,), dtype)
        params = {
            "llama": llama_lib.init_llama_params(next(keys), s.llama, dtype),
            "siglip": init_vit_params(next(keys), s.siglip, dtype),
            "projector": projector,
        }
        if s.use_fused_vision:
            params["dinov2"] = init_vit_params(next(keys), s.dinov2, dtype)
        return params

    # ------------------------------------------------------------------

    def _vision_features(self, params: Dict, pixel_values: jax.Array) -> jax.Array:
        """[B, 6 or 3, H, W] -> projected patch embeds [B, 256, llama_dim].
        Fused backbones receive a 6-channel stack (DINOv2 + SigLIP image
        normalizations differ; the processor stacks both)."""
        s = self.spec
        if s.use_fused_vision:
            if pixel_values.shape[1] == 6:
                px_dino, px_sig = pixel_values[:, :3], pixel_values[:, 3:]
            else:
                px_dino = px_sig = pixel_values
            feats = jnp.concatenate(
                [
                    vit_forward(params["dinov2"], px_dino, s.dinov2),
                    vit_forward(params["siglip"], px_sig, s.siglip),
                ],
                axis=-1,
            )
        else:
            feats = vit_forward(params["siglip"], pixel_values, s.siglip)
        p = params["projector"]
        x = jax.nn.gelu(feats @ p["fc1_w"] + p["fc1_b"], approximate=False)
        if "fc3_w" in p:  # fused-backbone 3-layer projector (OpenVLA)
            x = jax.nn.gelu(x @ p["fc2_w"] + p["fc2_b"], approximate=False)
            return x @ p["fc3_w"] + p["fc3_b"]
        # prismatic single-backbone MLP projector: Linear-GELU-Linear
        return x @ p["fc2_w"] + p["fc2_b"]

    def _build_prompt_embeds(self, params, input_ids, pixel_values):
        """[BOS] + patches + prompt tokens -> embeds [B, 1+P+S-1, H]."""
        lp = params["llama"]
        tok_embeds = lp["embed_tokens"][input_ids]  # [B, S, H]
        patches = self._vision_features(params, pixel_values).astype(tok_embeds.dtype)
        return jnp.concatenate(
            [tok_embeds[:, :1], patches, tok_embeds[:, 1:]], axis=1
        )

    # ------------------------------------------------------------------

    def predict_action_tokens(
        self, params: Dict, input_ids: jax.Array, pixel_values: jax.Array
    ) -> jax.Array:
        """Greedy AR decode of action_dim tokens. Jittable."""
        s = self.spec
        embeds = self._build_prompt_embeds(params, input_ids, pixel_values)
        b, total, _ = embeds.shape
        valid = jnp.ones((b, total), jnp.int32)
        return llama_lib.greedy_generate(
            params["llama"], s.llama, embeds, valid, s.action_dim
        )

    def predict_action_tokens_ragged(
        self, params: Dict, input_ids: jax.Array, pixel_values: jax.Array,
        attn_valid: jax.Array,
    ) -> jax.Array:
        """Greedy AR decode with right-padded ragged prompts co-batched:
        validity covers [BOS, patches..., text[1:]], pad columns stay
        masked in the llama cache, and decode positions continue at each
        example's own prompt length — a padded example returns bitwise its
        solo answer (tests/test_serving_openvla.py). Jittable; the serving
        bucket path and the open-loop evaluator share this entry."""
        s = self.spec
        embeds = self._build_prompt_embeds(params, input_ids, pixel_values)
        b = embeds.shape[0]
        n_patch = embeds.shape[1] - input_ids.shape[1]
        valid = jnp.concatenate(
            [jnp.ones((b, 1 + n_patch), jnp.int32),
             attn_valid[:, 1:].astype(jnp.int32)],
            axis=1,
        )
        return llama_lib.greedy_generate(
            params["llama"], s.llama, embeds, valid, s.action_dim
        )

    def predict_action_tokens_jacobi(
        self, params: Dict, input_ids: jax.Array, pixel_values: jax.Array,
        attn_valid: Optional[jax.Array] = None, return_iters: bool = False,
        init_guess: Optional[jax.Array] = None,
        num_iters: Optional[int] = None,
    ):
        """Greedy action decode via LOSSLESS Jacobi self-speculation
        (llama.greedy_generate_jacobi): bit-identical tokens to the AR
        path, but each iteration verifies ALL ``action_dim`` positions in
        one multi-token forward — weights stream once per iteration
        instead of once per token, the win on a weight-bound 7B decode.
        Ragged right-padded prompts co-batch exactly (same validity
        scheme as predict_action_tokens_ragged). Jittable."""
        s = self.spec
        if attn_valid is None:
            attn_valid = jnp.ones_like(input_ids)
        embeds = self._build_prompt_embeds(params, input_ids, pixel_values)
        b = embeds.shape[0]
        n_patch = embeds.shape[1] - input_ids.shape[1]
        valid = jnp.concatenate(
            [jnp.ones((b, 1 + n_patch), jnp.int32),
             attn_valid[:, 1:].astype(jnp.int32)],
            axis=1,
        )
        return llama_lib.greedy_generate_jacobi(
            params["llama"], s.llama, embeds, valid, s.action_dim,
            return_iters=return_iters, init_guess=init_guess,
            num_iters=num_iters,
        )

    def detokenize_actions(self, token_ids: np.ndarray) -> np.ndarray:
        """token ids [B, action_dim] -> normalized actions in [-1, 1]."""
        discretized = self.spec.action_token_vocab - np.asarray(token_ids)
        discretized = np.clip(discretized - 1, 0, self.bin_centers.shape[0] - 1)
        return self.bin_centers[discretized]

    def tokenize_actions(self, actions: np.ndarray) -> np.ndarray:
        """normalized actions in [-1, 1] -> token ids [B, action_dim]; the
        exact inverse of ``detokenize_actions`` up to half a bin width
        (OpenVLA ActionTokenizer semantics: np.digitize into the uniform
        bins, token = vocab - bin). Training labels for the CE loss."""
        a = np.clip(np.asarray(actions), -1.0, 1.0)
        bins = np.linspace(-1, 1, self.spec.n_action_bins)
        discretized = np.digitize(a, bins)  # 1 .. n_bins
        return (self.spec.action_token_vocab - discretized).astype(np.int32)

    def action_ce_loss(
        self,
        params: Dict,
        input_ids: jax.Array,  # [B, T] prompt ids with the ground-truth
        # action tokens APPENDED right after each example's prompt (so the
        # valid tokens stay contiguous and right padding sits at the end)
        attn_valid: jax.Array,  # [B, T] 1 over prompt+action tokens
        pixel_values: jax.Array,
        action_tokens: jax.Array,  # [B, action_dim] labels
        remat: bool = False,
    ) -> jax.Array:
        """Teacher-forced next-token cross-entropy over the action_dim
        action tokens (the OpenVLA fine-tuning objective — the loss the
        reference's OFT ``lora_adapter/`` checkpoints were trained with on
        GPU; here it runs as ONE jittable forward, no decode loop). Jittable;
        differentiable through LoRA/QLoRA adapter dicts via ops.quant.mm.
        ``remat`` rematerializes the llama layers in the backward pass
        (llama.forward) — the 7B single-chip capacity lever."""
        s = self.spec
        embeds = self._build_prompt_embeds(params, input_ids, pixel_values)
        b, total, _ = embeds.shape
        n_patch = total - input_ids.shape[1]
        valid = jnp.concatenate(
            [jnp.ones((b, 1 + n_patch), jnp.int32),
             attn_valid[:, 1:].astype(jnp.int32)],
            axis=1,
        )
        pos = jnp.broadcast_to(
            jnp.arange(total, dtype=jnp.int32)[None], (b, total)
        )
        mask = llama_lib.causal_prefill_mask(valid, total)
        cache = llama_lib.alloc_cache(s.llama, b, total, embeds.dtype)
        h, _ = llama_lib.forward(
            params["llama"], s.llama, embeds, pos, mask, cache, jnp.int32(0),
            remat=remat,
        )
        # action token i (ids position n_prompt+i) is predicted from the
        # PREVIOUS position's logits; ids position j embeds at n_patch + j.
        # Gather the action_dim hidden states FIRST, then run the lm_head on
        # [B, action_dim, H] — full-sequence [B, T, V] logits would cost
        # ~T/action_dim x the lm_head FLOPs and activations for rows that
        # are immediately discarded (300 MB at 7B dims, batch 8).
        n_prompt = jnp.sum(attn_valid.astype(jnp.int32), -1) - s.action_dim
        label_pos = (
            n_patch + n_prompt[:, None] - 1
            + jnp.arange(s.action_dim, dtype=jnp.int32)[None]
        )  # [B, action_dim]
        h_sel = jnp.take_along_axis(h, label_pos[..., None], axis=1)
        sel = llama_lib.logits(params["llama"], s.llama, h_sel)
        logp = jax.nn.log_softmax(sel.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, action_tokens[..., None], axis=-1)
        return -jnp.mean(ll)

    def unnormalize(self, normalized: np.ndarray, unnorm_key: str) -> np.ndarray:
        stats = self.norm_stats[unnorm_key]["action"]
        high = np.asarray(stats["q99"])
        low = np.asarray(stats["q01"])
        mask = np.asarray(stats.get("mask", np.ones_like(low, dtype=bool)))
        return np.where(
            mask, 0.5 * (normalized + 1) * (high - low) + low, normalized
        )

    def predict_action(
        self,
        params: Dict,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        unnorm_key: Optional[str] = None,
        _jitted_tokens=None,
    ) -> np.ndarray:
        """HF-remote-code-compatible surface: returns unnormalized [action_dim]
        numpy actions (batch 1) or [B, action_dim]."""
        input_ids = jnp.asarray(input_ids)
        if int(input_ids[0, -1]) != EMPTY_TOKEN:
            pad = jnp.full((input_ids.shape[0], 1), EMPTY_TOKEN, input_ids.dtype)
            input_ids = jnp.concatenate([input_ids, pad], axis=1)
        fn = _jitted_tokens or self.predict_action_tokens
        toks = np.asarray(fn(params, input_ids, jnp.asarray(pixel_values)))
        actions = self.detokenize_actions(toks)
        if unnorm_key is not None:
            actions = self.unnormalize(actions, unnorm_key)
        return actions[0] if actions.shape[0] == 1 else actions

    def get_action_dim(self, unnorm_key: str) -> int:
        return len(self.norm_stats[unnorm_key]["action"]["q01"])


# ---------------------------------------------------------------------------
# OFT: continuous action head (parallel decoding variant)
# ---------------------------------------------------------------------------


def init_oft_action_head(
    rng: jax.Array, in_dim: int, hidden_dim: int, out_dim: int, n_blocks: int,
    dtype=jnp.float32,
) -> Dict:
    keys = iter(jax.random.split(rng, 3 + n_blocks))

    def dense(key, fan_in, shape):
        return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

    return {
        "ln1_w": jnp.ones((in_dim,), dtype),
        "ln1_b": jnp.zeros((in_dim,), dtype),
        "fc1_w": dense(next(keys), in_dim, (in_dim, hidden_dim)),
        "fc1_b": jnp.zeros((hidden_dim,), dtype),
        "blocks": {
            "ln_w": jnp.ones((n_blocks, hidden_dim), dtype),
            "ln_b": jnp.zeros((n_blocks, hidden_dim), dtype),
            "w": dense(next(keys), hidden_dim, (n_blocks, hidden_dim, hidden_dim)),
            "b": jnp.zeros((n_blocks, hidden_dim), dtype),
        },
        "ln2_w": jnp.ones((hidden_dim,), dtype),
        "ln2_b": jnp.zeros((hidden_dim,), dtype),
        "fc2_w": dense(next(keys), hidden_dim, (hidden_dim, out_dim)),
        "fc2_b": jnp.zeros((out_dim,), dtype),
    }


# NOTE on OFT-head parity: the math below (flatten the WHOLE chunk of
# action hidden states into one vector, residual blocks = x + Linear(LN(x))
# with NO activation, ReLU proprio projector) is exactly the REFERENCE's own
# reimplementation (reference scripts/eval_hf_vla_simpler.py:30-72), which
# is what this framework mirrors. Upstream openvla-oft differs (per-timestep
# head with GELU blocks); if real OFT checkpoints with per-timestep shapes
# appear, the dims are reconstructed from the checkpoint either way
# (checkpoint.load_oft_aux_params), matching the reference's shape-driven
# loader (reference :99-117).
def oft_action_head_forward(p: Dict, x: jax.Array) -> jax.Array:
    """MLP-ResNet regression head (math of reference _OFTActionHead,
    eval_hf_vla_simpler.py:40-63: LN -> fc1 -> [x + Linear(LN(x))]* -> LN ->
    fc2)."""
    x = layer_norm(x, p["ln1_w"], p["ln1_b"], 1e-5)
    x = x @ p["fc1_w"] + p["fc1_b"]

    def block(x, bp):
        y = layer_norm(x, bp["ln_w"], bp["ln_b"], 1e-5)
        return x + (y @ bp["w"] + bp["b"]), None

    x, _ = jax.lax.scan(block, x, p["blocks"])
    x = layer_norm(x, p["ln2_w"], p["ln2_b"], 1e-5)
    return x @ p["fc2_w"] + p["fc2_b"]


def init_oft_proprio_projector(
    rng: jax.Array, in_dim: int, hidden_dim: int, out_dim: int, dtype=jnp.float32
) -> Dict:
    k1, k2 = jax.random.split(rng)

    def dense(key, fan_in, shape):
        return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

    return {
        "fc1_w": dense(k1, in_dim, (in_dim, hidden_dim)),
        "fc1_b": jnp.zeros((hidden_dim,), dtype),
        "fc2_w": dense(k2, hidden_dim, (hidden_dim, out_dim)),
        "fc2_b": jnp.zeros((out_dim,), dtype),
    }


def oft_proprio_forward(p: Dict, x: jax.Array) -> jax.Array:
    """fc2(relu(fc1(x))) (reference _OFTProprioProjector:65-73)."""
    return jax.nn.relu(x @ p["fc1_w"] + p["fc1_b"]) @ p["fc2_w"] + p["fc2_b"]


class OpenVLAOFT(OpenVLA):
    """Parallel-decoding OFT variant: instead of 7 greedy AR steps, one
    forward over ``chunk_len * action_dim`` placeholder tokens whose final
    hidden states feed the continuous action head."""

    def __init__(
        self,
        spec: OpenVLASpec,
        norm_stats: Optional[Dict] = None,
        chunk_len: int = 8,
        use_proprio: bool = False,
        proprio_dim: int = 8,
    ):
        super().__init__(spec, norm_stats)
        self.chunk_len = chunk_len
        self.use_proprio = use_proprio
        self.proprio_dim = proprio_dim

    def init_params(self, rng, dtype=jnp.float32):
        params = super().init_params(rng, dtype)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        h = self.spec.llama.hidden_size
        n_tok = self.chunk_len * self.spec.action_dim
        params["action_head"] = init_oft_action_head(
            k1, in_dim=n_tok * h, hidden_dim=h, out_dim=n_tok, n_blocks=2,
            dtype=dtype,
        )
        if self.use_proprio:
            params["proprio_projector"] = init_oft_proprio_projector(
                k2, self.proprio_dim, h, h, dtype
            )
        return params

    def predict_action_continuous(
        self,
        params: Dict,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        proprio: Optional[jax.Array] = None,
        attn_valid: Optional[jax.Array] = None,
        remat: bool = False,
    ) -> jax.Array:
        """[B, chunk_len, action_dim] normalized actions; jittable.

        ``attn_valid`` [B, S_ids] enables right-padded ragged prompts in one
        batch (the serving bucket): pad columns stay masked everywhere and
        the tail (empty token + placeholders [+ proprio]) takes per-example
        RoPE positions continuing at each example's own prompt length, so a
        padded example computes exactly its unpadded result. None = all
        valid (the original fixed-length path, same program)."""
        s = self.spec
        if attn_valid is None:
            attn_valid = jnp.ones_like(input_ids)
        embeds = self._build_prompt_embeds(params, input_ids, pixel_values)
        b, s_e, _ = embeds.shape
        n_patch = s_e - input_ids.shape[1]
        v_prefix = jnp.concatenate(
            [jnp.ones((b, 1 + n_patch), jnp.int32),
             attn_valid[:, 1:].astype(jnp.int32)],
            axis=1,
        )  # [B, S_e]
        n_valid_e = jnp.sum(v_prefix, axis=-1)  # [B]
        tail = []
        if self.use_proprio and proprio is not None:
            pe = oft_proprio_forward(
                params["proprio_projector"], proprio.astype(embeds.dtype)
            )
            tail.append(pe[:, None, :])
        n_tok = self.chunk_len * s.action_dim
        # trailing empty token 29871, like the remote code's AR path (the
        # training-time prompt always ends with it)
        tail.append(jnp.broadcast_to(
            params["llama"]["embed_tokens"][EMPTY_TOKEN][None, None, :],
            (b, 1 + n_tok, s.llama.hidden_size),
        ).astype(embeds.dtype))
        embeds = jnp.concatenate([embeds] + tail, axis=1)
        total = embeds.shape[1]
        n_tail = total - s_e
        cache = llama_lib.alloc_cache(s.llama, b, total, embeds.dtype)
        # prefix positions: valid tokens are contiguous from 0, so arange is
        # per-example correct; tail positions continue at n_valid_e
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.arange(s_e, dtype=jnp.int32)[None], (b, s_e)
                ),
                n_valid_e[:, None].astype(jnp.int32)
                + jnp.arange(n_tail, dtype=jnp.int32)[None],
            ],
            axis=1,
        )
        # OFT parallel decoding attends BIDIRECTIONALLY among the action
        # placeholder tokens (a headline OFT design point); the prompt
        # prefix stays causal, pad columns stay masked
        v_full = jnp.concatenate(
            [v_prefix, jnp.ones((b, n_tail), jnp.int32)], axis=1
        )
        mask = llama_lib.causal_prefill_mask(v_full, total)
        rows = jnp.arange(total)[None, :, None] >= total - n_tok
        cols = jnp.arange(total)[None, None, :] >= total - n_tok
        mask = mask | (rows & cols)
        h, _ = llama_lib.forward(
            params["llama"], s.llama, embeds, pos, mask, cache, jnp.int32(0),
            remat=remat,
        )
        h = llama_lib.final_hidden(params["llama"], s.llama, h)
        act_hidden = h[:, -n_tok:, :].reshape(b, -1)
        out = oft_action_head_forward(params["action_head"], act_hidden)
        return out.reshape(b, self.chunk_len, s.action_dim)

    def oft_l1_loss(
        self,
        params: Dict,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        actions: jax.Array,  # [B, chunk_len, action_dim] normalized targets
        proprio: Optional[jax.Array] = None,
        attn_valid: Optional[jax.Array] = None,
        remat: bool = False,
    ) -> jax.Array:
        """The OFT fine-tuning objective: L1 between the parallel-decoded
        continuous chunk and the ground truth (the loss the reference's
        ``action_head--*_checkpoint.pt`` modules were trained with upstream;
        openvla-oft's continuous-action recipe). ``attn_valid`` lets ragged
        right-padded prompts train in one batch (each example computes its
        unpadded forward — see predict_action_continuous). Jittable;
        differentiable through LoRA/QLoRA llama adapters via ops.quant.mm."""
        pred = self.predict_action_continuous(
            params, input_ids, pixel_values, proprio, attn_valid=attn_valid,
            remat=remat,
        )
        return jnp.mean(jnp.abs(pred - actions.astype(pred.dtype)))

    def predict_action(
        self,
        params: Dict,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        unnorm_key: Optional[str] = None,
        proprio: Optional[jax.Array] = None,
        _jitted=None,
    ) -> np.ndarray:
        fn = _jitted or self.predict_action_continuous
        out = np.asarray(
            fn(params, jnp.asarray(input_ids), jnp.asarray(pixel_values),
               jnp.asarray(proprio) if proprio is not None else None)
        )
        if unnorm_key is not None:
            out = self.unnormalize(out, unnorm_key)
        return out[0] if out.shape[0] == 1 else out
