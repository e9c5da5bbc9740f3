"""LoRA adapters: functional application and checkpoint-merge.

Two reference surfaces map here:
- the vendored open-pi-zero ships only a stub (`get_layer` raises when LoRA
  is requested, reference src/model/lora.py:17-30) — here LoRA is actually
  implemented, as pure functions over (A, B) factor pytrees;
- the OpenVLA eval path merges PEFT ``lora_adapter/`` checkpoints into the
  base weights before running (reference eval_hf_vla_simpler.py:135-179) —
  ``merge_peft_adapter_into_llama`` reproduces that merge for the JAX
  parameter tree.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def init_lora_params(
    rng: jax.Array, in_dim: int, out_dim: int, r: int, dtype=jnp.float32
) -> Dict:
    """A ~ N(0, 1/r), B = 0 (standard LoRA init: adapter starts as identity)."""
    return {
        "a": jax.random.normal(rng, (in_dim, r), dtype) * (r**-0.5),
        "b": jnp.zeros((r, out_dim), dtype),
    }


def apply_lora(x: jax.Array, w: jax.Array, lora: Optional[Dict],
               scale: float = 1.0) -> jax.Array:
    """y = x @ W + scale * (x @ A) @ B."""
    y = x @ w
    if lora is not None:
        y = y + scale * (x @ lora["a"]) @ lora["b"]
    return y


def merge_lora(w: jax.Array, lora: Dict, scale: float = 1.0) -> jax.Array:
    """W' = W + scale * A @ B (one-time merge, zero runtime overhead)."""
    return w + scale * lora["a"] @ lora["b"]


def merge_peft_adapter_into_llama(
    llama_params: Dict, adapter_dir: str, dtype=jnp.bfloat16
) -> Dict:
    """Merge a PEFT LoRA adapter directory (adapter_model.safetensors +
    adapter_config.json) into a stacked-layer Llama parameter tree.

    PEFT keys look like
    ``base_model.model.language_model.model.layers.{i}.self_attn.q_proj.
    lora_A.weight`` with torch [out, in] layout; scale = lora_alpha / r.
    """
    import json
    import re

    from safetensors import safe_open

    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    with open(cfg_path) as f:
        acfg = json.load(f)
    scale = float(acfg.get("lora_alpha", 16)) / float(acfg.get("r", 16))

    tensors = {}
    for fname in ("adapter_model.safetensors", "adapter_model.bin"):
        path = os.path.join(adapter_dir, fname)
        if os.path.exists(path):
            if fname.endswith(".safetensors"):
                with safe_open(path, framework="pt", device="cpu") as fh:
                    for k in fh.keys():
                        tensors[k] = fh.get_tensor(k).float().numpy()
            else:
                import torch

                for k, v in torch.load(path, map_location="cpu").items():
                    tensors[k] = v.float().numpy()
            break
    if not tensors:
        raise FileNotFoundError(f"no adapter weights in {adapter_dir}")

    name_map = {
        "q_proj": "q_w", "k_proj": "k_w", "v_proj": "v_w", "o_proj": "o_w",
        "gate_proj": "gate_w", "up_proj": "up_w", "down_proj": "down_w",
    }
    lre = re.compile(r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight")
    per: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for k, v in tensors.items():
        m = lre.search(k)
        if not m:
            continue
        i, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        per.setdefault(proj, {}).setdefault(i, {})[ab] = v

    layers = dict(llama_params["layers"])
    if _adapter_already_merged(layers, name_map, per, scale):
        log.warning(
            "Base weights already contain the LoRA adapter (projection "
            "coefficient ~1); skipping merge to avoid double-applying it "
            "(OFT snapshots may ship pre-merged base weights alongside "
            "lora_adapter/)."
        )
        return llama_params
    merged_count = 0
    for proj, by_layer in per.items():
        ours = name_map.get(proj)
        if ours is None or ours not in layers:
            continue
        w = np.array(layers[ours], np.float32)  # [L, in, out] writable copy
        for i, ab in by_layer.items():
            if "A" not in ab or "B" not in ab:
                continue
            delta = scale * (ab["B"] @ ab["A"]).T  # torch [out,in] -> [in,out]
            w[i] = w[i] + delta
            merged_count += 1
        layers[ours] = jnp.asarray(w, dtype)
    log.info("Merged %d LoRA layer factors from %s", merged_count, adapter_dir)
    out = dict(llama_params)
    out["layers"] = layers
    return out


def _adapter_already_merged(
    layers: Dict, name_map: Dict, per: Dict, scale: float, n_check: int = 6
) -> bool:
    """Detect whether the base weights already contain the adapter deltas.

    For each sampled (projection, layer) factor, the scalar projection of the
    base weight onto the adapter delta, ``c = <W, d> / <d, d>``, is ~1 when
    W = W_base + d (some OFT snapshots ship merged base weights WITH the
    ``lora_adapter/`` directory; re-merging would silently double the delta
    and corrupt the actions) and ~0 ± (|W|/|d|)·cos(W, d) when unmerged.
    Because that unmerged noise term is UNBOUNDED for small deltas mildly
    aligned with W, "merged" requires EVERY sampled coefficient to sit in a
    narrow band around 1 — a scattered or offset set of coefficients (the
    unmerged signature) keeps the merge enabled. Zero-delta factors (fresh
    B=0 adapters) are ignored — merging those is a no-op.
    """
    # Round-robin across projection types AND stride across layers so the
    # sample is not dominated by one projection's earliest layers (a merged
    # head with an unmerged tail, or vice versa, must be sampled at both
    # ends to be classified correctly).
    candidates: List[Tuple[str, int]] = []
    projs = [p for p in sorted(per) if name_map.get(p) in layers]
    per_proj_layers = {
        p: sorted(i for i, ab in per[p].items() if "A" in ab and "B" in ab)
        for p in projs
    }
    rank = 0
    while len(candidates) < n_check and any(per_proj_layers.values()):
        for p in projs:
            lst = per_proj_layers[p]
            if not lst:
                continue
            # alternate front/back of the layer range per visit
            i = lst.pop(0) if rank % 2 == 0 else lst.pop(-1)
            candidates.append((p, i))
            if len(candidates) >= n_check:
                break
        rank += 1
    coeffs = []
    for proj, i in candidates:
        ours = name_map[proj]
        ab = per[proj][i]
        delta = scale * (ab["B"] @ ab["A"]).T
        denom = float((delta * delta).sum())
        if denom < 1e-12:
            continue
        w = np.asarray(layers[ours][i], np.float32)
        coeffs.append(float((w * delta).sum()) / denom)
    if not coeffs:
        return False
    log.debug("adapter projection coefficients: %s", coeffs)
    return all(0.6 < c < 1.4 for c in coeffs)


def maybe_merge_lora_adapter(llama_params: Dict, model_dir: str, dtype=jnp.bfloat16) -> Dict:
    """Auto-merge ``<model_dir>/lora_adapter/`` when present (the reference's
    --use-lora auto behavior)."""
    adapter_dir = os.path.join(model_dir, "lora_adapter")
    if os.path.isdir(adapter_dir):
        try:
            return merge_peft_adapter_into_llama(llama_params, adapter_dir, dtype)
        except Exception as exc:
            log.warning("LoRA merge failed (%s); continuing without.", exc)
    return llama_params
