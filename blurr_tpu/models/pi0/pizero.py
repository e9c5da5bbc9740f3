"""Pi-0 VLA model, TPU-native.

Functional re-design of the reference PiZero wrapper (reference
src/model/vla/pizero.py): SigLIP tower + projector + Gemma-format joint
mixture engine + action/proprio/time encoders + action decoder, running
flow-matching Euler integration with a per-control-step prefix KV cache.

Execution model (the BLURR fast path):
    one ``jax.jit``-compiled function per control step =
        on-device image preprocessing fusion (caller-side)
        -> embed merge -> SigLIP -> prefill (277 tokens, 18 layers, cache KV)
        -> ``lax.scan`` over num_inference_steps flow updates
           (4 action tokens, 18 layers, cached prefix K/V)
        -> clip -> action chunk
No host round-trips inside the step; masks are built in-graph from the token
validity vector instead of the reference's host-side [B,1,S,S] float masks.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.models.pi0.joint import JointSpec
from blurr_tpu.models.pi0.siglip import (
    init_projector_params,
    init_siglip_params,
    projector_forward,
    siglip_forward,
)
from blurr_tpu.ops import masks as mask_lib
from blurr_tpu.ops.activations import silu
from blurr_tpu.ops.embeddings import sinusoidal_pos_emb
from blurr_tpu.ops.norms import rms_norm


@dataclass(frozen=True)
class PiZeroSpec:
    max_image_text_tokens: int
    num_proprio_tokens: int  # cond_steps
    num_action_tokens: int  # horizon_steps
    action_dim: int
    proprio_dim: int
    num_inference_steps: int
    final_action_clip_value: Optional[float]
    flow_sig_min: float
    image_token_index: int
    pad_token_id: int
    vocab_size: int
    time_max_period: float
    adaptive_mode: Optional[str]
    time_hidden_size: int
    use_lm_head: bool

    @property
    def total_num_tokens(self) -> int:
        return (
            self.max_image_text_tokens
            + self.num_proprio_tokens
            + self.num_action_tokens
        )


def spec_from_config(cfg: dict) -> PiZeroSpec:
    return PiZeroSpec(
        max_image_text_tokens=cfg["max_image_text_tokens"],
        num_proprio_tokens=cfg["cond_steps"],
        num_action_tokens=cfg["horizon_steps"],
        action_dim=cfg["action_dim"],
        proprio_dim=cfg["proprio_dim"],
        num_inference_steps=cfg["num_inference_steps"],
        final_action_clip_value=cfg.get("final_action_clip_value"),
        # explicit 0.0 is a valid choice (flow matching without min noise);
        # only an absent/None key falls back to the reference default
        flow_sig_min=(
            0.001 if cfg.get("flow_sig_min") is None
            else float(cfg["flow_sig_min"])
        ),
        image_token_index=cfg["image_token_index"],
        pad_token_id=cfg["pad_token_id"],
        vocab_size=cfg["vocab_size"],
        time_max_period=float(cfg.get("time_max_period", 10000.0)),
        adaptive_mode=cfg.get("action_expert_adaptive_mode") or None,
        time_hidden_size=int(cfg.get("time_hidden_size", 256) or 256),
        use_lm_head=bool(cfg.get("use_lm_head", False)),
    )


def _checked_mode(qcfg: dict, name: str, allowed: set):
    """Normalized quantization mode: ''/'none' -> None (the reference's
    empty-config stubs), anything else must be in ``allowed``."""
    mode = (str(qcfg.get("mode") or "")).lower()
    if mode in ("", "none"):
        return None
    if mode not in allowed:
        raise ValueError(
            f"{name}.mode {mode!r} is not supported; expected one of "
            f"{sorted(allowed)} (or empty to disable)"
        )
    return mode


class PiZero:
    """Holds static config; parameters are an explicit pytree argument."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.spec = spec_from_config(cfg)
        self.joint_spec = JointSpec.from_config(dict(cfg["joint"]["config"]))
        # quantization config (reference bridge.yaml:39-46 stubs). Unknown
        # NON-empty modes raise here: silently falling through would report
        # quantized-preset numbers measured on unquantized weights (the
        # empty-mode stubs in the reference configs stay a clean no-op).
        aq = cfg.get("action_quantization") or {}
        kq = cfg.get("kv_quantization") or {}
        self.action_quant_mode = _checked_mode(
            aq, "action_quantization",
            {"int8", "int8_cached", "bnb_int8", "w8a8", "w4a8"},
        )
        self.action_quant_cache_fp = bool(aq.get("cache_fp_weight", False))
        # w4a8 accuracy knobs (ops.quant.quantize_mixture_w4a8): row-group
        # size for the group-wise int4 scales, and weight names kept in
        # w8a8 (mixed precision for quantization-sensitive matrices)
        self.action_w4a8_group_size = int(aq.get("group_size", 512) or 512)
        self.action_w4a8_int8_keys = tuple(aq.get("int8_keys") or ())
        self.kv_quant_mode = _checked_mode(kq, "kv_quantization", {"int8"})
        self.kv_quant_clip = kq.get("activation_clip")
        vq = cfg.get("vlm_quantization") or {}
        self.vlm_quant_mode = _checked_mode(
            vq, "vlm_quantization", {"w8a8", "w4a8"}
        )
        self.vlm_quant_vision = bool(vq.get("include_vision", False))
        self.vlm_w4a8_group_size = int(vq.get("group_size", 512) or 512)
        self.vlm_w4a8_int8_keys = tuple(vq.get("int8_keys") or ())
        # kv_quantization.dtype is the DEQUANTIZATION dtype (the fp dtype
        # cached int8 chunks are restored to — reference kv_cache.py:100-106
        # and bridge.yaml:46 `dtype: bfloat16`)
        kv_dtype = (str(kq.get("dtype") or "")).lower().removeprefix("torch.")
        _KV_DTYPES = {"": None, "bfloat16": jnp.bfloat16,
                      "float32": jnp.float32, "float16": jnp.bfloat16}
        if kv_dtype not in _KV_DTYPES:
            raise ValueError(
                f"kv_quantization.dtype={kq['dtype']!r} unsupported "
                f"(bfloat16/float32/float16)"
            )
        if kv_dtype == "float16":
            log.warning(
                "kv_quantization.dtype=float16 -> bfloat16 on TPU (fp16 has "
                "no native TPU support; dequantized KV chunks get bf16 "
                "numerics, not fp16)"
            )
        self.kv_dequant_dtype = _KV_DTYPES[kv_dtype]
        # activation clips are PER MIXTURE: the action expert's clip must not
        # leak into a quantized VLM mixture (and vice versa)
        import dataclasses

        def _clip(qcfg, enabled):
            c = qcfg.get("activation_clip")
            return float(c) if (enabled and c is not None) else None

        a_clip = _clip(aq, self.action_quant_mode in {
            "int8", "int8_cached", "bnb_int8", "w8a8", "w4a8",
        })
        v_clip = _clip(vq, self.vlm_quant_mode in ("w8a8", "w4a8"))
        # the action/proprio encoders and action decoder are quantized with
        # the ACTION clip (reference enable_action_quantization quantizes
        # them with the same Int8QuantConfig, pizero.py:290-301); mm() only
        # applies the clip to quantized weight dicts, so passing it for the
        # unquantized case is a no-op
        self.encoder_activation_clip = a_clip
        if a_clip is not None or v_clip is not None:
            mixtures = dict(self.joint_spec.mixtures)
            for name, c in (("action", a_clip), ("proprio", a_clip),
                            ("vlm", v_clip)):
                if c is not None and name in mixtures:
                    mixtures[name] = dataclasses.replace(
                        mixtures[name], activation_clip=c
                    )
            self.joint_spec = dataclasses.replace(
                self.joint_spec, mixtures=mixtures
            )
        self.vision_cfg = dict(cfg["vision"]["config"])
        self.projector_cfg = dict(cfg["vision_projector"]["config"])
        self.vlm_hidden = self.joint_spec.mixtures["vlm"].hidden_size
        self.action_hidden = self.joint_spec.mixtures["action"].hidden_size
        self.proprio_hidden = self.joint_spec.mixtures["proprio"].hidden_size

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, dtype=jnp.float32) -> Dict:
        s = self.spec
        keys = iter(jax.random.split(rng, 12))

        def dense(key, fan_in, shape):
            return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

        aw = self.action_hidden
        # Non-adaptive mode: time embedding has the action width and is
        # concatenated into the action encoder (pizero.py:90-98).
        time_cond_in = 2 * aw if s.adaptive_mode is None else aw
        params = {
            "embed_tokens": dense(next(keys), self.vlm_hidden, (s.vocab_size, self.vlm_hidden)),
            "siglip": init_siglip_params(next(keys), self.vision_cfg, dtype),
            "projector": init_projector_params(next(keys), self.projector_cfg, dtype),
            "joint": joint_lib.init_joint_params(next(keys), self.joint_spec, dtype),
            "action_encoder": {
                "w1": dense(next(keys), s.action_dim, (s.action_dim, aw)),
                "b1": jnp.zeros((aw,), dtype),
                "w2": dense(next(keys), time_cond_in, (time_cond_in, aw)),
                "b2": jnp.zeros((aw,), dtype),
                "w3": dense(next(keys), aw, (aw, aw)),
                "b3": jnp.zeros((aw,), dtype),
            },
            "proprio_encoder": {
                "w": dense(next(keys), s.proprio_dim, (s.proprio_dim, self.proprio_hidden)),
                "b": jnp.zeros((self.proprio_hidden,), dtype),
            },
            "action_decoder": {
                "w": dense(next(keys), aw, (aw, s.action_dim)),
                "b": jnp.zeros((s.action_dim,), dtype),
            },
        }
        return params

    def load_pretrained_weights(self, params: Dict, pretrained_model_path: str,
                                dtype=None) -> Dict:
        """Merge PaliGemma pretrained weights (embed tokens, vision tower,
        projector, vlm mixture) into a parameter tree — the reference's
        load_pretrained_weights (pizero.py:168-230) as a functional update."""
        from blurr_tpu.models.pi0.checkpoint import (
            paligemma_params_from_safetensors,
        )

        if dtype is None:
            dtype = jax.tree.leaves(params)[0].dtype
        pre = paligemma_params_from_safetensors(pretrained_model_path, dtype)
        params = dict(params)
        params["embed_tokens"] = pre["embed_tokens"]
        params["siglip"] = pre["siglip"]
        params["projector"] = pre["projector"]
        params["joint"] = dict(params["joint"])
        vlm = dict(params["joint"]["vlm"])
        for k, v in pre["joint"]["vlm"].items():
            if k == "final_norm" and "final_norm" not in vlm:
                continue  # vlm final norm only used in text mode
            vlm[k] = v
        params["joint"]["vlm"] = vlm
        return params

    def enable_action_quantization(self, params: Dict) -> Dict:
        """Functional equivalent of the reference's in-place module rewrite
        (pizero.py:274-321): int8-quantize the action mixture and the action/
        proprio encoders + action decoder when cfg.action_quantization.mode is
        set. bnb_int8 maps to the same int8 path on TPU."""
        if self.action_quant_mode not in {
            "int8", "int8_cached", "bnb_int8", "w8a8", "w4a8",
        }:
            return params
        from blurr_tpu.ops.quant import (
            quantize_dense_int8,
            quantize_mixture_int8,
            quantize_mixture_w4a8,
            quantize_mixture_w8a8,
        )

        from blurr_tpu.models.pi0.trainable import _subtrees_tied

        # leaf-level tie detection (subtree identity breaks when sharding /
        # device_put rebuilds the dicts while keeping the leaves aliased)
        tied = _subtrees_tied(
            params["joint"].get("proprio"), params["joint"].get("action")
        )
        params = dict(params)
        params["joint"] = dict(params["joint"])
        if self.action_quant_mode in ("w8a8", "w4a8"):
            import functools

            qfn = (
                quantize_mixture_w8a8 if self.action_quant_mode == "w8a8"
                else functools.partial(
                    quantize_mixture_w4a8,
                    group_size=self.action_w4a8_group_size,
                    int8_keys=self.action_w4a8_int8_keys,
                )
            )
            params["joint"]["action"] = qfn(params["joint"]["action"])
            if tied:
                params["joint"]["proprio"] = params["joint"]["action"]
            return params
        params["joint"]["action"] = quantize_mixture_int8(
            params["joint"]["action"], cache_fp_weight=self.action_quant_cache_fp
        )
        if tied:
            params["joint"]["proprio"] = params["joint"]["action"]
        params["action_encoder"] = quantize_dense_int8(
            params["action_encoder"], ("w1", "w2", "w3"),
            cache_fp_weight=self.action_quant_cache_fp,
        )
        # proprio_encoder and action_decoder deliberately stay fp: the
        # reference's quantize_module_int8 only swaps CHILD Linears
        # (int8_linear.py:95-103), and those two are bare nn.Linear modules
        # with no children — so its calls on them (pizero.py:299-302) are
        # no-ops. Keeping them fp matches the reference numerically, and the
        # tiny [proprio_dim, H] / [H, action_dim] weights are irrelevant to
        # bandwidth anyway.
        return params

    def enable_vlm_quantization(self, params: Dict) -> Dict:
        """Performance extension beyond the reference's quantization menu:
        W8A8 (dynamic per-token int8 activations x int8 weights on the MXU)
        for the prefill-heavy VLM mixture, or W4A8 (nibble-packed int4
        weights via the fused Pallas kernel — halves the weight reads again;
        pays off where the step is weight-bandwidth-bound, e.g. the pool64
        short-pad preset). Opt-in via cfg.vlm_quantization.
        """
        if self.vlm_quant_mode not in ("w8a8", "w4a8"):
            return params
        from blurr_tpu.ops.quant import (
            quantize_mixture_w4a8,
            quantize_mixture_w8a8,
            quantize_vit_w8a8,
        )

        import functools

        params = dict(params)
        params["joint"] = dict(params["joint"])
        qfn = (
            quantize_mixture_w8a8 if self.vlm_quant_mode == "w8a8"
            else functools.partial(
                quantize_mixture_w4a8,
                group_size=self.vlm_w4a8_group_size,
                int8_keys=self.vlm_w4a8_int8_keys,
            )
        )
        params["joint"]["vlm"] = qfn(params["joint"]["vlm"])
        # the ViT tower stays int8 under w4a8 (small weights; int8 accuracy)
        if self.vlm_quant_vision:
            params["siglip"] = quantize_vit_w8a8(params["siglip"])
        return params

    def tie_action_proprio_weights(self, params: Dict) -> Dict:
        """Point the proprio mixture at the action mixture's arrays
        (reference tie_action_proprio_weights, pizero.py:270-272).

        This ALIASED form is the inference/serving representation (the
        duplicate leaves are the same buffers, halving their HBM). For
        TRAINING use :meth:`canonicalize_tied_weights` — differentiating an
        aliased tree gives each duplicate leaf only its own partial gradient,
        which is NOT torch shared-Parameter semantics."""
        params = dict(params)
        params["joint"] = dict(params["joint"])
        params["joint"]["proprio"] = params["joint"]["action"]
        return params

    def canonicalize_tied_weights(self, params: Dict) -> Dict:
        """Training-canonical form of a tied tree: when the proprio mixture
        is tied to the action mixture (same subtree or leaf-aliased, as
        tie_action_proprio_weights and the torch bridge produce), replace it
        with ``None``. Forward paths resolve ``None`` -> the action weights
        (:meth:`_joint_weights`), so each action leaf is used by BOTH
        mixtures inside one trace and autodiff SUMS the two cotangents —
        exactly a shared torch Parameter's gradient. The optimizer then keeps
        ONE moment set and buffer donation becomes legal (no duplicated
        buffers). Untied trees pass through unchanged."""
        from blurr_tpu.models.pi0.trainable import _subtrees_tied

        jp = params.get("joint") or {}
        if not _subtrees_tied(jp.get("proprio"), jp.get("action")):
            return params
        params = dict(params)
        params["joint"] = dict(params["joint"])
        params["joint"]["proprio"] = None
        return params

    def _joint_weights(self, params: Dict) -> Dict:
        """Joint-mixture weights with the canonical tied form resolved:
        ``joint.proprio is None`` means 'use the action mixture's weights'
        (see canonicalize_tied_weights). Resolution happens at trace time,
        so under ``jax.grad`` the shared leaves accumulate both mixtures'
        gradient contributions."""
        jp = params["joint"]
        if jp.get("proprio") is None:
            jp = dict(jp)
            jp["proprio"] = jp["action"]
        return jp

    # ------------------------------------------------------------------
    # Mask / position-id parity API
    # ------------------------------------------------------------------

    def build_causal_mask_and_position_ids(self, attention_mask: jax.Array):
        """Boolean full block mask + per-mixture position ids (the reference's
        additive-float equivalent is available via
        blurr_tpu.ops.masks.additive_from_bool)."""
        s = self.spec
        full = mask_lib.pi0_full_mask(
            attention_mask,
            s.max_image_text_tokens,
            s.num_proprio_tokens,
            s.num_action_tokens,
        )
        vlm, proprio, action = mask_lib.pi0_position_ids(
            attention_mask.shape[0],
            s.max_image_text_tokens,
            s.num_proprio_tokens,
            s.num_action_tokens,
        )
        return full, vlm, proprio, action

    def split_full_mask_into_submasks(self, full_mask: jax.Array):
        s = self.spec
        p = s.max_image_text_tokens + s.num_proprio_tokens
        return full_mask[:, :p, :p], full_mask[:, -s.num_action_tokens :, :]

    # ------------------------------------------------------------------
    # Encoders
    # ------------------------------------------------------------------

    def _embed_merge(
        self,
        params: Dict,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        remat: bool = False,
        sp_axis: Optional[str] = None,
    ) -> jax.Array:
        """Text embedding + scaled image features merged at image-token slots
        (reference _forward_siglip_and_text_embedding, pizero.py:433-471).
        The VLAProcessor always places the image tokens first, which lets the
        scatter be a static prefix overwrite."""
        s = self.spec
        text_embeds = params["embed_tokens"][input_ids]
        feats = siglip_forward(
            params["siglip"], pixel_values, self.vision_cfg, remat=remat,
            sp_axis=sp_axis,
        )
        feats = projector_forward(params["projector"], feats)
        feats = feats / jnp.asarray(self.vlm_hidden**0.5, feats.dtype)

        n_img = feats.shape[1]
        text_mask = (input_ids != s.image_token_index) & (
            input_ids != s.pad_token_id
        )
        merged = jnp.where(text_mask[..., None], text_embeds, 0.0)
        img_mask_head = (input_ids[:, :n_img] == s.image_token_index)[..., None]
        head = jnp.where(img_mask_head, feats.astype(merged.dtype), merged[:, :n_img])
        return jnp.concatenate([head, merged[:, n_img:]], axis=1)

    def _encode_proprio(self, params: Dict, proprios: jax.Array) -> jax.Array:
        from blurr_tpu.ops.quant import mm

        p = params["proprio_encoder"]
        return mm(proprios, p["w"], self.encoder_activation_clip) + p["b"]

    def _encode_action(
        self, params: Dict, action: jax.Array, time_emb: Optional[jax.Array]
    ) -> jax.Array:
        """3-layer MLP with optional time concat (reference ActionEncoder,
        src/model/vla/modules.py:25-53; time embedding goes FIRST in the
        concat)."""
        from blurr_tpu.ops.quant import mm

        clip = self.encoder_activation_clip
        ae = params["action_encoder"]
        emb = mm(action, ae["w1"], clip) + ae["b1"]
        if self.spec.adaptive_mode is None:
            t_full = jnp.broadcast_to(
                time_emb[:, None, :], (emb.shape[0], emb.shape[1], time_emb.shape[-1])
            )
            emb = jnp.concatenate([t_full, emb], axis=-1)
        emb = silu(mm(emb, ae["w2"], clip) + ae["b2"])
        return mm(emb, ae["w3"], clip) + ae["b3"]

    def _time_embedding(self, t: jax.Array) -> jax.Array:
        s = self.spec
        dim = s.time_hidden_size if s.adaptive_mode else self.action_hidden
        return sinusoidal_pos_emb(t, dim, s.time_max_period)

    def _decode_action(self, params: Dict, hidden: jax.Array) -> jax.Array:
        from blurr_tpu.ops.quant import mm

        ad = params["action_decoder"]
        return mm(hidden, ad["w"], self.encoder_activation_clip) + ad["b"]

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------

    def infer_action(
        self,
        params: Dict,
        input_ids: jax.Array,  # [B, S]
        attention_mask: jax.Array,  # [B, S]
        pixel_values: jax.Array,  # [B, C, H, W] preprocessed floats
        proprios: jax.Array,  # [B, cond_steps, proprio_dim]
        noise: jax.Array,  # [B, horizon, action_dim]
        num_inference_steps: Optional[int] = None,
    ) -> jax.Array:
        """Prefix-cached flow integration (reference infer_action,
        pizero.py:473-547). ``noise`` is passed explicitly so cache/naive
        equivalence is testable; callers sample it from a PRNG key."""
        s = self.spec
        steps = num_inference_steps or s.num_inference_steps
        bsz = input_ids.shape[0]

        prefix_mask = mask_lib.pi0_prefix_mask(
            attention_mask, s.max_image_text_tokens, s.num_proprio_tokens
        )
        action_mask = mask_lib.pi0_action_mask(
            attention_mask,
            s.max_image_text_tokens,
            s.num_proprio_tokens,
            s.num_action_tokens,
        )
        vlm_pos, proprio_pos, action_pos = mask_lib.pi0_position_ids(
            bsz, s.max_image_text_tokens, s.num_proprio_tokens, s.num_action_tokens
        )

        inputs_embeds = self._embed_merge(params, input_ids, pixel_values)
        proprio_embeds = self._encode_proprio(params, proprios)

        # adaptive mixtures need a conditioning at prefill; the cached path
        # fixes it at the flow start (t=0) — see joint.prefill docstring
        prefill_tc = None
        if s.adaptive_mode:
            prefill_tc = self._time_embedding(jnp.zeros((bsz,), noise.dtype)).astype(
                noise.dtype
            )
        jw = self._joint_weights(params)
        cache = joint_lib.prefill(
            {"vlm": jw["vlm"], "proprio": jw["proprio"]},
            self.joint_spec,
            {"vlm": inputs_embeds, "proprio": proprio_embeds},
            {"vlm": vlm_pos, "proprio": proprio_pos},
            prefix_mask,
            time_cond=prefill_tc,
        )
        if self.kv_quant_mode == "int8":
            from blurr_tpu.ops.quant import quantize_kv_int8

            clip = self.kv_quant_clip
            k_q, k_s = quantize_kv_int8(cache[0], clip)
            v_q, v_s = quantize_kv_int8(cache[1], clip)
            cache = {"k": k_q, "v": v_q, "k_scale": k_s, "v_scale": v_s}

        delta_t = 1.0 / steps
        dtype = noise.dtype

        def flow_step(carry, _):
            action, t = carry
            time_emb = self._time_embedding(t).astype(dtype)
            time_cond = time_emb if s.adaptive_mode else None
            action_embeds = self._encode_action(params, action, time_emb)
            hidden = joint_lib.decode(
                {"action": jw["action"]},
                self.joint_spec,
                action_embeds,
                action_pos,
                cache,
                action_mask,
                time_cond,
                kv_dequant_dtype=self.kv_dequant_dtype,
            )
            vel = self._decode_action(params, hidden)
            return (action + delta_t * vel, t + delta_t), None

        # t accumulates in the MODEL dtype on purpose: the reference's
        # Euler loop does `t = torch.zeros(bsz, dtype=dtype); t += delta_t`
        # (pizero.py:517,538), so bf16 presets carry bf16 time — matching
        # its rounding is a parity requirement, not an oversight (fp32 t
        # would deviate from the reference's bf16 actions).
        t0 = jnp.zeros((bsz,), dtype)
        (action, _), _ = jax.lax.scan(flow_step, (noise, t0), None, length=steps)
        if s.final_action_clip_value is not None:
            action = jnp.clip(
                action, -s.final_action_clip_value, s.final_action_clip_value
            )
        return action

    def infer_action_from_frame(
        self,
        params: Dict,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        frame: jax.Array,  # raw camera frame [B, H, W, 3] uint8
        proprios: jax.Array,
        noise: jax.Array,
        num_inference_steps: Optional[int] = None,
    ) -> jax.Array:
        """Fully fused control step: camera-frame resize + rescale/normalize
        run IN-GRAPH (jax.image lanczos3) ahead of the encoder, per the
        TPU north star — no host-side cv2 in the loop. The host path
        (cv2 LANCZOS4) remains the bit-parity default in the adapters."""
        size = self.vision_cfg["image_size"]
        x = frame.astype(jnp.float32)
        x = jax.image.resize(
            x, (frame.shape[0], size, size, 3), method="lanczos3"
        )
        from blurr_tpu.models.pi0.processing import (
            IMAGENET_STANDARD_MEAN,
            IMAGENET_STANDARD_STD,
        )

        x = (x / 255.0 - IMAGENET_STANDARD_MEAN) / IMAGENET_STANDARD_STD
        pixel_values = jnp.transpose(x, (0, 3, 1, 2)).astype(proprios.dtype)
        return self.infer_action(
            params, input_ids, attention_mask, pixel_values, proprios, noise,
            num_inference_steps,
        )

    def infer_action_naive(
        self,
        params: Dict,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        pixel_values: jax.Array,
        proprios: jax.Array,
        noise: jax.Array,
        num_inference_steps: Optional[int] = None,
    ) -> jax.Array:
        """No-cache ablation: the full VLM+proprio+action stack runs every
        flow step (reference infer_action_naive, pizero.py:549-614)."""
        s = self.spec
        steps = num_inference_steps or s.num_inference_steps
        bsz = input_ids.shape[0]

        full_mask = mask_lib.pi0_full_mask(
            attention_mask,
            s.max_image_text_tokens,
            s.num_proprio_tokens,
            s.num_action_tokens,
        )
        vlm_pos, proprio_pos, action_pos = mask_lib.pi0_position_ids(
            bsz, s.max_image_text_tokens, s.num_proprio_tokens, s.num_action_tokens
        )
        inputs_embeds = self._embed_merge(params, input_ids, pixel_values)
        proprio_embeds = self._encode_proprio(params, proprios)

        delta_t = 1.0 / steps
        dtype = noise.dtype
        # the reference's naive loop caches the prefix K/V on the first flow
        # step, so adaptive vlm/proprio mixtures stay conditioned on t=0 for
        # the whole integration (pizero.py:595-601, joint_model.py:180-197)
        prefix_tc = None
        if s.adaptive_mode:
            prefix_tc = self._time_embedding(jnp.zeros((bsz,), dtype)).astype(dtype)

        def flow_step(carry, _):
            action, t = carry
            time_emb = self._time_embedding(t).astype(dtype)
            time_cond = time_emb if s.adaptive_mode else None
            action_embeds = self._encode_action(params, action, time_emb)
            hidden = joint_lib.naive_forward(
                self._joint_weights(params),
                self.joint_spec,
                {
                    "vlm": inputs_embeds,
                    "proprio": proprio_embeds,
                    "action": action_embeds,
                },
                {"vlm": vlm_pos, "proprio": proprio_pos, "action": action_pos},
                full_mask,
                time_cond,
                prefix_time_cond=prefix_tc,
            )
            vel = self._decode_action(params, hidden)
            return (action + delta_t * vel, t + delta_t), None

        # t accumulates in the MODEL dtype on purpose: the reference's
        # Euler loop does `t = torch.zeros(bsz, dtype=dtype); t += delta_t`
        # (pizero.py:517,538), so bf16 presets carry bf16 time — matching
        # its rounding is a parity requirement, not an oversight (fp32 t
        # would deviate from the reference's bf16 actions).
        t0 = jnp.zeros((bsz,), dtype)
        (action, _), _ = jax.lax.scan(flow_step, (noise, t0), None, length=steps)
        if s.final_action_clip_value is not None:
            action = jnp.clip(
                action, -s.final_action_clip_value, s.final_action_clip_value
            )
        return action

    # ------------------------------------------------------------------
    # Flow-matching training loss (capability parity; pizero.py:664-718)
    # ------------------------------------------------------------------

    def psi_t(self, x: jax.Array, x1: jax.Array, t: jax.Array) -> jax.Array:
        t = t[:, None, None]
        return (1 - (1 - self.spec.flow_sig_min) * t) * x + t * x1

    def flow_loss(
        self,
        params: Dict,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        pixel_values: jax.Array,
        proprios: jax.Array,
        actions: jax.Array,
        t: jax.Array,  # [B]
        x0: jax.Array,  # noise, same shape as actions
        remat: bool = False,  # jax.checkpoint per joint layer (see naive_forward)
        pipeline=None,  # parallel.pipeline.PipelineCtx: stage the joint scan
        sp_axis: Optional[str] = None,  # GSPMD sequence parallelism: shard
        # the vlm/SigLIP token axis over this mesh axis (joint.naive_forward)
    ) -> jax.Array:
        s = self.spec
        bsz = input_ids.shape[0]
        if sp_axis is not None and pipeline is not None:
            # checked before the first sharding constraint fires, so the
            # caller sees the semantic error, not a missing-mesh RuntimeError
            raise ValueError(
                "sequence parallelism (sp_axis) and pipeline parallelism use "
                "different meshes; compose sp with data/tensor axes instead"
            )
        # psi_t mixes through the fp32 flow-time t; cast back so the action
        # mixture (and the attention it shares with vlm/proprio) stays in
        # the weights' dtype — without this a bf16 train step fails to
        # compile (fp32 creep flips the layer-scan carry dtype)
        psi = self.psi_t(x0, actions, t).astype(actions.dtype)

        full_mask = mask_lib.pi0_full_mask(
            attention_mask,
            s.max_image_text_tokens,
            s.num_proprio_tokens,
            s.num_action_tokens,
        )
        vlm_pos, proprio_pos, action_pos = mask_lib.pi0_position_ids(
            bsz, s.max_image_text_tokens, s.num_proprio_tokens, s.num_action_tokens
        )
        inputs_embeds = self._embed_merge(
            params, input_ids, pixel_values, remat=remat, sp_axis=sp_axis
        )
        proprio_embeds = self._encode_proprio(params, proprios)
        time_emb = self._time_embedding(t).astype(actions.dtype)
        time_cond = time_emb if s.adaptive_mode else None
        action_embeds = self._encode_action(params, psi, time_emb)
        hidden = joint_lib.naive_forward(
            self._joint_weights(params),
            self.joint_spec,
            {"vlm": inputs_embeds, "proprio": proprio_embeds, "action": action_embeds},
            {"vlm": vlm_pos, "proprio": proprio_pos, "action": action_pos},
            full_mask,
            time_cond,
            remat=remat,
            pipeline=pipeline,
            sp_axis=sp_axis,
        )
        v_psi = self._decode_action(params, hidden)
        d_psi = actions - (1 - s.flow_sig_min) * x0
        # reduce in fp32: bf16 mean over B*H*A terms loses ~2 decimal digits
        return jnp.mean(
            (v_psi.astype(jnp.float32) - d_psi.astype(jnp.float32)) ** 2
        )

    # ------------------------------------------------------------------
    # Text generation (PaliGemma path; reference infer_text, pizero.py:616-650)
    # ------------------------------------------------------------------

    def infer_text_prefill(
        self,
        params: Dict,
        input_ids: jax.Array,
        pixel_values: jax.Array,
        max_cache_len: int,
        attention_mask: Optional[jax.Array] = None,
    ):
        """Prefill the vlm mixture and return (logits, cache, cache_len).

        The PaliGemma prefix attends bidirectionally; ``attention_mask``
        ([B, q_len] validity) excludes padded positions in batched prompts
        (omitted = all valid, the single-prompt demo path).
        """
        bsz, q_len = input_ids.shape
        embeds = self._embed_merge(params, input_ids, pixel_values)
        pos = jnp.broadcast_to(
            jnp.arange(1, q_len + 1, dtype=jnp.int32)[None], (bsz, q_len)
        )
        cache = joint_lib.alloc_single_cache(
            self.joint_spec, bsz, max_cache_len, embeds.dtype
        )
        cols = jnp.arange(max_cache_len)[None, None, :]
        mask = jnp.broadcast_to(cols < q_len, (bsz, q_len, max_cache_len))
        if attention_mask is not None:
            valid = jnp.pad(
                attention_mask.astype(bool),
                ((0, 0), (0, max_cache_len - q_len)),
                constant_values=True,  # decode columns become valid as written
            )
            mask = mask & valid[:, None, :]
        hidden, cache = joint_lib.single_forward(
            params["joint"],
            self.joint_spec,
            "vlm",
            embeds,
            pos,
            mask,
            cache=cache,
            cache_len=jnp.int32(0),
        )
        # last position only through the 257k-vocab tied head (the full
        # [B, S, V] projection is ~155 MB + 316 GFLOP of waste; generation
        # reads logits[:, -1] only). Under right padding the last VALID
        # position per example is gathered (hidden[:, -1] would read a pad
        # row — same fix as openvla/llama.greedy_generate).
        if attention_mask is not None:
            last_idx = jnp.sum(attention_mask.astype(jnp.int32), axis=-1) - 1
            h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
        else:
            h_last = hidden[:, -1:]
        logits = h_last @ params["embed_tokens"].T
        return logits, cache, jnp.int32(q_len)

    def infer_text_decode_step(
        self,
        params: Dict,
        token: jax.Array,
        cache,
        cache_len: jax.Array,
        attn_valid: Optional[jax.Array] = None,
    ):
        """One greedy decode step with the preallocated cache.

        ``attn_valid`` ([B, prompt_len] validity) must be passed for batched
        right-padded prompts: it masks the pad slots' cached K/V out of every
        decode step and corrects each example's RoPE position to
        n_valid + generated (pad slots consumed prefill positions).
        """
        if token.ndim == 1:
            token = token[:, None]
        bsz = token.shape[0]
        embeds = params["embed_tokens"][token]  # [B, 1, H]
        max_len = cache[0].shape[3]
        cols = jnp.arange(max_len)[None, None, :]
        mask = jnp.broadcast_to(cols <= cache_len, (bsz, 1, max_len))
        if attn_valid is not None:
            q_len = attn_valid.shape[1]
            valid = jnp.pad(
                attn_valid.astype(bool),
                ((0, 0), (0, max_len - q_len)),
                constant_values=True,  # generated columns are always valid
            )
            mask = mask & valid[:, None, :]
            n_pad = q_len - jnp.sum(attn_valid.astype(jnp.int32), axis=-1)  # [B]
            pos = (cache_len + 1 - n_pad)[:, None].astype(jnp.int32)
        else:
            pos = jnp.broadcast_to(
                cache_len[None, None] + 1, (bsz, 1)
            ).astype(jnp.int32)
        hidden, cache = joint_lib.single_forward(
            params["joint"],
            self.joint_spec,
            "vlm",
            embeds,
            pos,
            mask,
            cache=cache,
            cache_len=cache_len,
        )
        logits = hidden @ params["embed_tokens"].T
        next_token = jnp.argmax(logits[:, -1, :], axis=-1)
        return next_token, cache, cache_len + 1


class PiZeroInference(PiZero):
    """Parity alias: forward == infer_action (reference pizero.py:721-742)."""

    def forward(self, params, **kwargs):
        return self.infer_action(params, **kwargs)


def make_jitted_infer(model: PiZero):
    """Jit the control-step function once; returns
    fn(params, input_ids, attention_mask, pixel_values, proprios, noise)."""

    @jax.jit
    def step(params, input_ids, attention_mask, pixel_values, proprios, noise):
        return model.infer_action(
            params, input_ids, attention_mask, pixel_values, proprios, noise
        )

    return step
