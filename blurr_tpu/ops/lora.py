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


# ---------------------------------------------------------------------------
# LoRA fine-tuning over parameter pytrees (train_pi0_flow.py --lora-rank)
# ---------------------------------------------------------------------------
# The reference ships only the inference-side PEFT merge above; training
# adapters is the natural TPU-native extension: target weight leaves become
# {"w", "lora_a", "lora_b", "lora_s"} dicts that ops.quant.mm dispatches
# (y = x@W + s * (x@A)@B), optax.masked trains ONLY the factors, and the
# base "w" may itself be a quantized dict (QLoRA-style).

LORA_KEYS = frozenset({"w", "lora_a", "lora_b", "lora_s"})


def is_lora_dict(x) -> bool:
    return isinstance(x, dict) and "lora_a" in x


def _leaf_in_out(w) -> Optional[Tuple[Tuple[int, ...], int, int]]:
    """(leading_shape, in_dim, out_dim) of a weight leaf ([in, out] layout,
    optionally layer-stacked [L, in, out]); None if it is not LoRA-able."""
    if isinstance(w, dict):  # quantized base: recover dims from the int repr
        if "q" in w or "q8a" in w:
            q = w.get("q", w.get("q8a"))
            return tuple(q.shape[:-2]), q.shape[-2], q.shape[-1]
        if "q4" in w:
            # block-major nibble packing [..., NB, K//2, BN]; the group
            # scales carry the exact (unpadded) out width [..., G, N]
            q4, s = w["q4"], w["s"]
            return tuple(q4.shape[:-3]), 2 * q4.shape[-2], s.shape[-1]
        return None
    if getattr(w, "ndim", 0) < 2:
        return None
    return tuple(w.shape[:-2]), w.shape[-2], w.shape[-1]


def inject_lora_tree(
    params,
    rng: jax.Array,
    rank: int,
    targets: Tuple[str, ...] = ("q_w", "v_w"),
    alpha: Optional[float] = None,
    dtype=None,
) -> Dict:
    """Replace every ``targets`` weight leaf in the tree (2D [in, out] or
    layer-stacked [L, in, out]; plain or int8/w8a8/w4a8-quantized) with a LoRA
    adapter dict. A ~ N(0, 1/r), B = 0 (identity start), per-layer scale
    s = alpha/r stacked alongside so the factor dicts stay valid lax.scan
    leaves. Returns a new tree; non-target leaves are shared, not copied."""
    scale = float(alpha if alpha is not None else rank) / float(rank)
    keys = iter(jax.random.split(rng, 4096))

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if is_lora_dict(tree) or set(tree) & {"q", "q8a", "q4", "fp"}:
            return tree  # never descend INTO an adapter / quant dict
        out = {}
        for k, v in tree.items():
            dims = _leaf_in_out(v) if k in targets else None
            if dims is None:
                out[k] = walk(v) if isinstance(v, dict) else v
                continue
            lead, din, dout = dims
            dt = dtype
            if dt is None:
                dt = v.dtype if not isinstance(v, dict) else jnp.float32
            out[k] = {
                "w": v,
                "lora_a": jax.random.normal(
                    next(keys), (*lead, din, rank), dt) * (rank ** -0.5),
                "lora_b": jnp.zeros((*lead, rank, dout), dt),
                "lora_s": jnp.full(lead or (), scale, jnp.float32),
            }
        return out

    return walk(params)


def merge_lora_tree(params) -> Dict:
    """Fold every adapter dict back into a plain weight (W + s * A @ B) —
    the zero-runtime-overhead inference form, matching the checkpoint
    layout. Quantized bases cannot absorb the fp delta; keep those trees in
    adapter form (mm dispatches them at full fidelity)."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if is_lora_dict(tree):
            if isinstance(tree["w"], dict):
                raise ValueError(
                    "merge_lora_tree: quantized base weights cannot absorb "
                    "the LoRA delta without a dequant/requant round-trip; "
                    "serve the adapter dict directly (mm dispatches it)."
                )
            a, b = tree["lora_a"], tree["lora_b"]
            delta = jnp.einsum("...ir,...ro->...io", a, b)
            s = tree["lora_s"].astype(delta.dtype)
            return (tree["w"] + delta * s[..., None, None]).astype(
                tree["w"].dtype
            )
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)


def lora_trainable_mask(params) -> Dict:
    """Boolean pytree for optax.masked: True ONLY on lora_a/lora_b factors
    (the base weights and scales stay frozen). A canonical-tied None subtree
    stays None (empty pytree) so the mask structure matches the params."""

    def walk(tree):
        if tree is None:
            return None
        if not isinstance(tree, dict):
            return False
        if is_lora_dict(tree):
            return {
                "w": jax.tree.map(lambda _: False, tree["w"]),
                "lora_a": True,
                "lora_b": True,
                "lora_s": False,
            }
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)


# ---------------------------------------------------------------------------
# PEFT-format adapter export (the inverse of merge_peft_adapter_into_llama)
# ---------------------------------------------------------------------------

_PEFT_NAME_MAP = {
    "q_w": ("self_attn", "q_proj"), "k_w": ("self_attn", "k_proj"),
    "v_w": ("self_attn", "v_proj"), "o_w": ("self_attn", "o_proj"),
    "gate_w": ("mlp", "gate_proj"), "up_w": ("mlp", "up_proj"),
    "down_w": ("mlp", "down_proj"),
}


def save_peft_adapter(llama_layers: Dict, adapter_dir: str,
                      base_model_name: str = "openvla/openvla-7b",
                      module_prefix: str = "language_model.model.layers") -> int:
    """Write the LoRA factors of a stacked-layer llama tree (adapter dicts
    from ``inject_lora_tree``) as a PEFT ``lora_adapter/`` directory —
    adapter_config.json + adapter_model.safetensors with torch [out, in]
    layouts and ``base_model.model.language_model.model.layers.{i}.
    self_attn.q_proj.lora_A.weight``-style keys, the exact format the
    reference's eval merges at load (reference
    scripts/eval_hf_vla_simpler.py:135-179). Adapters LoRA-trained here on
    TPU therefore drop into the reference's GPU eval unchanged (and into
    this repo's own ``merge_peft_adapter_into_llama``). Returns the number
    of exported (projection, layer) factor pairs."""
    import json

    from safetensors.numpy import save_file

    tensors: Dict[str, np.ndarray] = {}
    rank = alpha = None
    targets = []
    for ours, (block, proj) in _PEFT_NAME_MAP.items():
        d = llama_layers.get(ours)
        if not (isinstance(d, dict) and "lora_a" in d):
            continue
        targets.append(proj)
        a = np.asarray(d["lora_a"], np.float32)  # [L, in, r]
        b = np.asarray(d["lora_b"], np.float32)  # [L, r, out]
        s = np.asarray(d["lora_s"], np.float32)  # [L]
        rank = a.shape[-1]
        # PEFT applies scale = alpha/r at load; fold any per-layer deviation
        # from s[0] into lora_B so the merged product is exact
        alpha = float(s[0]) * rank
        prefix = f"base_model.model.{module_prefix}"
        for i in range(a.shape[0]):
            b_i = b[i] * (s[i] / s[0]) if s[i] != s[0] else b[i]
            tensors[f"{prefix}.{i}.{block}.{proj}.lora_A.weight"] = (
                np.ascontiguousarray(a[i].T)  # torch [r, in]
            )
            tensors[f"{prefix}.{i}.{block}.{proj}.lora_B.weight"] = (
                np.ascontiguousarray(b_i.T)  # torch [out, r]
            )
    if not tensors:
        raise ValueError("no LoRA adapter dicts found in the llama tree")
    os.makedirs(adapter_dir, exist_ok=True)
    save_file(tensors, os.path.join(adapter_dir, "adapter_model.safetensors"))
    cfg = {
        "peft_type": "LORA",
        "base_model_name_or_path": base_model_name,
        "r": int(rank),
        "lora_alpha": alpha,
        "lora_dropout": 0.0,
        "bias": "none",
        "target_modules": sorted(set(targets)),
        "task_type": "CAUSAL_LM",
    }
    with open(os.path.join(adapter_dir, "adapter_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return len(tensors) // 2
