"""OpenVLA-family action serving: the ActionServer runtime (TCP transport,
dynamic batching, (dp, tp) mesh placement) driving the autoregressive
OpenVLA/MiniVLA stack instead of Pi-0.

The reference ships no serving daemon (SURVEY.md §0); its OpenVLA surface is
the eval/bench scripts' ``predict_action`` loop
(reference scripts/eval_hf_vla_simpler.py:566-620). Here that per-request
path — prompt build + tokenize, DINOv2+SigLIP (or SigLIP-only) features,
greedy AR decode of action_dim tokens, bin-center detokenize, optional
q01/q99 unnormalization — runs behind the same dynamic batcher as Pi-0:
requests pad to power-of-2 buckets, ragged prompts right-pad to a fixed
text length (the llama decode keeps pad columns masked and continues RoPE
at each example's own n_valid), and TP serving shards the 7B weights over
the 'model' mesh axis (the capacity path for 16 GB chips).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from blurr_tpu.serving.server import ActionServer

log = logging.getLogger(__name__)


class OpenVLAActionServer(ActionServer):
    """Serves OpenVLA-family action predictions over TCP.

    ``model_id``: HF snapshot dir, or 'random' (tiny spec) / 'random-7b' /
    'random-minivla' for checkpoint-free serving (same ids as
    scripts/benchmark_hf_vla.py). ``unnorm_key`` selects the norm-stats
    entry applied host-side after detokenization; None returns normalized
    [-1, 1] actions (callers unnormalize with their own stats).
    """

    def __init__(self, model_id: str = "random",
                 quantization: Optional[str] = None,
                 unnorm_key: Optional[str] = None,
                 use_bf16: bool = True, seed: int = 42,
                 max_batch: int = 1, batch_window_ms: float = 2.0,
                 tp: int = 1, dp: int = 1, max_text_tokens: int = 32,
                 oft: bool = False, chunk_len: int = 8,
                 use_proprio: bool = False, proprio_dim: int = 8,
                 checkpoint_path: Optional[str] = None,
                 max_queue: int = 0, decode: str = "ar",
                 bucket_mode: str = "pow2"):
        import jax
        import jax.numpy as jnp

        from blurr_tpu.models.openvla.build import build_openvla
        from blurr_tpu.models.openvla.model import EMPTY_TOKEN
        from blurr_tpu.models.openvla.processing import OpenVLAProcessor

        self._init_parallel(tp, dp, max_batch)
        self.dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        self.unnorm_key = unnorm_key
        self.max_text_tokens = int(max_text_tokens)
        self.oft = bool(oft)
        self.use_proprio = bool(use_proprio) and self.oft
        self.proprio_dim = int(proprio_dim)

        # shared model-id resolution (models/openvla/build.py): snapshot
        # dir or RANDOM_SPECS id, OFT aux load-or-init, PTQ of the LLM
        # (memory-safe: checkpoint-free 7B inits straight into quantized
        # form instead of transiently holding bf16 + int8 trees)
        built = build_openvla(
            model_id, dtype=self.dtype, oft=self.oft, chunk_len=chunk_len,
            use_proprio=self.use_proprio, proprio_dim=proprio_dim,
            quantization=quantization, memory_safe_quant_init=True,
            checkpoint_path=checkpoint_path or None,
        )
        self.model = built.model
        params = built.params
        spec = built.spec
        tokenizer = built.tokenizer
        # w4a8 x tp>1 is supported: shard_params repacks the block-major
        # int4 layout so the NB block axis divides the 'model' axis and the
        # kernel's GSPMD rule column-shards it (ops/pallas_int4_matmul.py:
        # int4_matmul_spmd); tp-sharded actions are asserted equal to
        # single-chip in tests/test_parallel.py and __graft_entry__.
        if self.unnorm_key is not None:
            if not self.model.norm_stats or (
                self.unnorm_key not in self.model.norm_stats
            ):
                raise ValueError(
                    f"unnorm_key {self.unnorm_key!r} not in the model's "
                    f"norm stats {sorted(self.model.norm_stats or {})}"
                )
        if self.mesh is not None:
            from blurr_tpu.parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        self.params = params
        self.spec = spec
        # hot-reload (base reload_checkpoint -> our _build_params) rebuilds
        # the params through the same constructor arguments
        self._model_id = model_id
        self._quantization = quantization
        self._chunk_len = int(chunk_len)
        self._decode = decode
        self._checkpoint_desc = str(checkpoint_path or model_id)
        self._empty_token = EMPTY_TOKEN
        self.processor = OpenVLAProcessor(
            tokenizer, image_size=spec.siglip.image_size,
            fused=spec.use_fused_vision,
        )

        model = self.model

        if self.oft:
            if self.use_proprio:
                def _step_fn(params, ids, am, px, proprio, key, idx):
                    return model.predict_action_continuous(
                        params, ids, px, proprio, attn_valid=am
                    )
            else:
                def _step_fn(params, ids, am, px, key, idx):
                    return model.predict_action_continuous(
                        params, ids, px, attn_valid=am
                    )
        elif decode == "jacobi":
            # lossless self-speculative decode: bit-identical tokens, each
            # Jacobi sweep verifies all action positions in one multi-token
            # forward (weights stream once per sweep, not once per token).
            # bf16-7B needs the stacked q/k/v in the transposed device
            # layout or the Jacobi program compile-OOMs (see
            # llama.relayout_qkv_for_jacobi) — a load-time relayout in
            # this decode mode; no-op for quantized/small models.
            if self.tp == 1 and self.dp == 1:
                from blurr_tpu.models.openvla import llama as _llama

                self.params = _llama.relayout_qkv_for_jacobi(self.params)

            def _step_fn(params, ids, am, px, key, idx):
                return model.predict_action_tokens_jacobi(params, ids, px, am)
        else:
            if decode != "ar":
                raise ValueError(f"decode {decode!r}: expected 'ar'/'jacobi'")

            def _step_fn(params, ids, am, px, key, idx):
                # key/idx keep the shared batcher contract; greedy decode is
                # deterministic. Ragged right-padded prompts co-batch
                # exactly (model.predict_action_tokens_ragged).
                return model.predict_action_tokens_ragged(params, ids, px, am)

        self._step = jax.jit(_step_fn)
        self._init_runtime(seed, max_batch, batch_window_ms,
                           max_queue=max_queue, bucket_mode=bucket_mode)

    def _build_params(self, checkpoint_path):
        """Hot-reload param build: the same build_openvla call as startup
        with the NEW checkpoint, keeping this server's model/spec/tokenizer
        (reload_checkpoint asserts structural compatibility before the
        swap). Re-applies the per-decode-mode preparation (sharding,
        Jacobi qkv relayout) so the reloaded tree serves through the
        already-compiled programs."""
        from blurr_tpu.models.openvla.build import build_openvla

        built = build_openvla(
            self._model_id, dtype=self.dtype, oft=self.oft,
            chunk_len=self._chunk_len, use_proprio=self.use_proprio,
            proprio_dim=self.proprio_dim, quantization=self._quantization,
            memory_safe_quant_init=True,
            checkpoint_path=checkpoint_path or None,
        )
        params = built.params
        if self.mesh is not None:
            from blurr_tpu.parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        if self._decode == "jacobi" and self.tp == 1 and self.dp == 1:
            from blurr_tpu.models.openvla import llama as _llama

            params = _llama.relayout_qkv_for_jacobi(params)
        return params

    # ------------------------------------------------------------------

    def _prepare(self, image: np.ndarray, instruction: str, proprio=None):
        """proprio rides the shared request schema; the base OpenVLA policy
        ignores it, the OFT variant (use_proprio) projects it into the
        prompt."""
        import jax.numpy as jnp

        from blurr_tpu.models.openvla.processing import (
            process_image,
            tokenize_prompt_ids,
        )

        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError(f"image must be HxWx3 uint8, got {image.shape}")
        with self._tok_lock:
            cached = self._tok_cache.get(instruction)
        if cached is None:
            ids = tokenize_prompt_ids(
                self.processor.tokenizer, instruction, self.max_text_tokens
            )
            am = [1] * len(ids) + [0] * (self.max_text_tokens - len(ids))
            ids = ids + [0] * (self.max_text_tokens - len(ids))
            cached = (
                np.asarray([ids], np.int32), np.asarray([am], np.int32),
            )
            with self._tok_lock:
                if len(self._tok_cache) >= 1024:
                    self._tok_cache.pop(next(iter(self._tok_cache)), None)
                self._tok_cache[instruction] = cached
        px = process_image(
            np.asarray(image), self.processor.image_size,
            self.processor.fused,
        )
        ids, am = cached
        out_t = (
            jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(px, self.dtype),
        )
        if self.use_proprio:
            if proprio is None:
                raise ValueError("this OFT server conditions on proprio; "
                                 "the request's proprio field is required")
            p = np.asarray(proprio, np.float32).reshape(1, -1)
            if p.shape[1] != self.proprio_dim:
                raise ValueError(
                    f"proprio has {p.shape[1]} dims, server expects "
                    f"{self.proprio_dim}"
                )
            out_t = out_t + (jnp.asarray(p, self.dtype),)
        if self._replicate is not None:
            import jax

            out_t = tuple(jax.device_put(a, self._replicate) for a in out_t)
        return out_t

    def _post(self, out: np.ndarray) -> np.ndarray:
        if self.oft:
            actions = np.asarray(out, np.float32)  # [B, chunk, action_dim]
        else:
            actions = self.model.detokenize_actions(out)
        if self.unnorm_key is not None:
            actions = self.model.unnormalize(actions, self.unnorm_key)
        return actions.astype(np.float32)

    def _dummy_request(self):
        size = self.spec.siglip.image_size
        proprio = [0.0] * self.proprio_dim if self.use_proprio else None
        return (np.zeros((size, size, 3), np.uint8), "warmup", proprio)
