"""Shared OpenVLA-family model construction.

One implementation of the model-id resolution the trainer
(scripts/train_openvla_lora.py), the action server
(blurr_tpu/serving/openvla_server.py), the benchmark CLI
(scripts/benchmark_hf_vla.py), and the open-loop evaluator all need:

- ``model_id``: an HF snapshot dir (OpenVLA / OpenVLA-OFT / MiniVLA — spec
  rebuilt from the weights, norm/dataset statistics + tokenizer loaded), or
  a checkpoint-free id from ``model.RANDOM_SPECS`` ('random', 'random-7b',
  'random-minivla', ...) for latency work and tests.
- OFT variant: continuous action head (+ optional proprio projector),
  loaded from the snapshot when present, else fresh-init — the same
  load-or-init the upstream OFT recipe uses
  (reference scripts/eval_hf_vla_simpler.py:40-132).
- Post-training quantization of the LLM: 'w8a8' / 'w4a8'. For the
  checkpoint-free 7B ids, ``memory_safe_quant_init=True`` builds the LLM
  DIRECTLY in quantized form (post-hoc quantization of a 7B bf16 tree
  transiently OOMs a 16 GB chip).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class BuiltVLA:
    model: object            # OpenVLA or OpenVLAOFT
    params: dict
    spec: object             # OpenVLASpec
    tokenizer: object        # None for checkpoint-free ids
    norm_stats: Optional[dict]
    dataset_stats: Optional[dict]


def build_openvla(
    model_id: str,
    *,
    dtype=jnp.bfloat16,
    oft: bool = False,
    chunk_len: int = 8,
    use_proprio: bool = False,
    proprio_dim: int = 8,
    quantization: Optional[str] = None,
    memory_safe_quant_init: bool = False,
    checkpoint_path: Optional[str] = None,
) -> BuiltVLA:
    from blurr_tpu.models.openvla.model import (
        RANDOM_SPECS,
        OpenVLA,
        OpenVLAOFT,
        OpenVLASpec,
    )

    if quantization in ("none", ""):
        quantization = None
    if quantization not in (None, "w8a8", "w4a8"):
        raise ValueError(f"quantization {quantization!r}: expected "
                         "None/'w8a8'/'w4a8'")

    def make_model(spec, norm_stats=None):
        if oft:
            return OpenVLAOFT(
                spec, norm_stats, chunk_len=chunk_len,
                use_proprio=use_proprio, proprio_dim=proprio_dim,
            )
        return OpenVLA(spec, norm_stats)

    norm_stats = None
    dataset_stats = None
    tokenizer = None
    path = Path(str(model_id)).expanduser()
    if path.is_dir():
        from blurr_tpu.models.openvla.checkpoint import (
            load_dataset_statistics,
            load_norm_stats,
            openvla_params_from_hf_dir,
        )
        from blurr_tpu.models.openvla.processing import load_hf_tokenizer

        spec = OpenVLASpec.from_snapshot_dir(path)
        norm_stats = load_norm_stats(str(path))
        dataset_stats = load_dataset_statistics(str(path))
        model = make_model(spec, norm_stats)
        tokenizer = load_hf_tokenizer(str(path))
        if checkpoint_path:
            # the orbax tree replaces every weight — only the spec/
            # tokenizer/statistics come from the snapshot. Loading the
            # full HF tree just to discard it would waste minutes AND
            # transiently hold two 7B trees (the >16 GB OOM CLAUDE.md
            # warns about).
            params = None
        else:
            params = openvla_params_from_hf_dir(str(path), spec, dtype)
        if oft and checkpoint_path is None:
            from blurr_tpu.models.openvla.checkpoint import (
                load_oft_aux_params,
            )
            from blurr_tpu.models.openvla.model import (
                init_oft_action_head,
                init_oft_proprio_projector,
            )

            head, proj = load_oft_aux_params(str(path), dtype)
            h = spec.llama.hidden_size
            n_tok = chunk_len * spec.action_dim
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            params["action_head"] = head if head is not None else (
                init_oft_action_head(k1, n_tok * h, h, n_tok, 2, dtype)
            )
            if use_proprio:
                params["proprio_projector"] = proj if proj is not None else (
                    init_oft_proprio_projector(k2, proprio_dim, h, h, dtype)
                )
    else:
        if str(model_id) not in RANDOM_SPECS:
            raise ValueError(
                f"model_id {model_id!r}: pass an HF snapshot dir or one "
                f"of {sorted(RANDOM_SPECS)}"
            )
        spec = RANDOM_SPECS[str(model_id)]()
        model = make_model(spec)
        if checkpoint_path:
            params = None  # the orbax tree replaces the random init below
        elif (quantization and memory_safe_quant_init
                and spec.llama.num_layers >= 32):
            # full-dims checkpoint-free 7B: drop the bf16 LLM and rebuild
            # it straight in quantized form (quantize_llama_* holds source
            # + quantized trees simultaneously and OOMs a 16 GB chip)
            import gc

            from blurr_tpu.models.openvla.llama import (
                init_llama_params_w4a8,
                init_llama_params_w8a8,
            )

            params = model.init_params(jax.random.PRNGKey(0), dtype)
            params["llama"] = None
            gc.collect()
            init_q = (init_llama_params_w8a8 if quantization == "w8a8"
                      else init_llama_params_w4a8)
            params["llama"] = init_q(jax.random.PRNGKey(0), spec.llama, dtype)
            return BuiltVLA(model, params, spec, tokenizer, norm_stats,
                            dataset_stats)
        else:
            params = model.init_params(jax.random.PRNGKey(0), dtype)

    if checkpoint_path:
        # orbax dir from train_openvla_lora --save-params: the FULL tree
        # (base incl. QLoRA quant dicts, LoRA factor dicts, OFT aux) —
        # served as-is; ops.quant.mm / the llama forward dispatch the
        # dicts. model_id still supplies the spec/tokenizer/norm stats.
        from blurr_tpu.models.pi0.checkpoint import restore_params
        from blurr_tpu.utils.optim import cast_floating_preserving_scales

        params = cast_floating_preserving_scales(
            restore_params(checkpoint_path), dtype)

    if quantization is not None:
        if _llama_has_quant_dicts(params["llama"]):
            if checkpoint_path:
                raise ValueError(
                    f"checkpoint {checkpoint_path!r} already carries a "
                    f"quantized LLM; drop quantization={quantization!r} "
                    "(the tree serves as-is)"
                )
            raise ValueError("params already quantized")
        if _llama_has_lora_dicts(params["llama"]):
            # quantize_llama_* skip dict-valued weights, so PTQ here would
            # silently leave the LoRA-wrapped projections (the largest
            # weights) unquantized — refuse instead of misleading the user
            raise ValueError(
                "the LLM carries LoRA factor dicts; PTQ would skip the "
                "wrapped projections. Merge the adapter first "
                "(ops.lora.merge_lora_tree) or train with --quantize-base."
            )
        from blurr_tpu.models.openvla.llama import (
            quantize_llama_w4a8,
            quantize_llama_w8a8,
        )

        qfn = (quantize_llama_w8a8 if quantization == "w8a8"
               else quantize_llama_w4a8)
        params["llama"] = qfn(params["llama"])
    return BuiltVLA(model, params, spec, tokenizer, norm_stats, dataset_stats)


def _llama_has_quant_dicts(llama: dict) -> bool:
    """True when any layer weight is a quantized dict ({"q"/"q8a"/"q4"}) —
    a tree that must not be re-quantized."""
    hit = []

    def walk(t):
        if isinstance(t, dict):
            if {"q", "q8a", "q4", "fp"} & set(t):
                hit.append(True)
                return
            for v in t.values():
                walk(v)

    walk(llama)
    return bool(hit)


def llama_has_w4a8(llama: dict) -> bool:
    """True when any layer weight is a w4a8 dict ({"q4","s"}) — block-major
    packed per-chip, so TP sharding must reject these trees however they
    arrived (quantization= arg or a pre-quantized checkpoint)."""
    hit = []

    def walk(t):
        if isinstance(t, dict):
            if "q4" in t:
                hit.append(True)
                return
            for v in t.values():
                walk(v)

    walk(llama)
    return bool(hit)


def _llama_has_lora_dicts(llama: dict) -> bool:
    """True when any layer weight is a LoRA factor dict ({"w","lora_a",...})."""
    hit = []

    def walk(t):
        if isinstance(t, dict):
            if "lora_a" in t:
                hit.append(True)
                return
            for v in t.values():
                walk(v)

    walk(llama)
    return bool(hit)
