"""Checkpoint bridge: HF OpenVLA (prismatic) safetensors -> JAX pytrees.

Key layout follows the prismatic remote code the reference loads through
AutoModelForVision2Seq (scripts/eval_hf_vla_simpler.py:729-737):
  language_model.model.layers.{i}.*   (Llama-2)
  vision_backbone.featurizer.*        (timm DINOv2 ViT-L/14 reg4)
  vision_backbone.fused_featurizer.*  (timm SigLIP ViT-So400m/14)
  projector.fc{1,2,3}.*
OFT aux heads ship as separate ``action_head--*.pt`` /
``proprio_projector--*.pt`` files with ``module.model.`` prefixes
(reference eval_hf_vla_simpler.py:76-132).
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

log = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
    return x.detach().to("cpu").float().numpy()


def load_safetensors_dir(path: str) -> Dict:
    from safetensors import safe_open

    tensors = {}
    for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(f, framework="pt", device="cpu") as fh:
            for key in fh.keys():
                tensors[key] = fh.get_tensor(key)
    if not tensors:
        raise FileNotFoundError(f"no safetensors under {path}")
    return tensors


def _stack(d: Dict[int, np.ndarray]) -> np.ndarray:
    idxs = sorted(d)
    assert idxs == list(range(len(idxs))), idxs
    return np.stack([d[i] for i in idxs])


def llama_params_from_hf(state: Dict, prefix: str = "language_model.") -> Dict:
    lre = re.compile(re.escape(prefix) + r"model\.layers\.(\d+)\.(.+)")
    per: Dict[str, Dict[int, np.ndarray]] = {}
    for k, v in state.items():
        if m := lre.match(k):
            per.setdefault(m.group(2), {})[int(m.group(1))] = _t(v)

    def lin(name):
        return _stack({i: w.T for i, w in per[name + ".weight"].items()})

    params = {
        "embed_tokens": _t(state[prefix + "model.embed_tokens.weight"]),
        "layers": {
            "q_w": lin("self_attn.q_proj"),
            "k_w": lin("self_attn.k_proj"),
            "v_w": lin("self_attn.v_proj"),
            "o_w": lin("self_attn.o_proj"),
            "gate_w": lin("mlp.gate_proj"),
            "up_w": lin("mlp.up_proj"),
            "down_w": lin("mlp.down_proj"),
            "input_norm": _stack(per["input_layernorm.weight"]),
            "post_norm": _stack(per["post_attention_layernorm.weight"]),
        },
        "final_norm": _t(state[prefix + "model.norm.weight"]),
    }
    # Qwen2-family (MiniVLA backbone) attention biases. Only bridge them when
    # every layer carries all three (a partial set would break the layer scan
    # and signals an unexpected layout).
    bias_names = [f"self_attn.{p}_proj.bias" for p in ("q", "k", "v")]
    n_layers = len(per["input_layernorm.weight"])
    if any(n in per for n in bias_names):
        if all(len(per.get(n, {})) == n_layers for n in bias_names):
            params["layers"]["q_b"] = _stack(per["self_attn.q_proj.bias"])
            params["layers"]["k_b"] = _stack(per["self_attn.k_proj.bias"])
            params["layers"]["v_b"] = _stack(per["self_attn.v_proj.bias"])
        else:
            log.warning(
                "Partial attention-bias set in checkpoint (expected q/k/v "
                "biases on all %d layers); ignoring biases.", n_layers
            )
    # tied word embeddings (Qwen2-0.5B) ship no lm_head tensor; the logits
    # path falls back to embed_tokens.T when the key is absent
    if prefix + "lm_head.weight" in state:
        params["lm_head"] = _t(state[prefix + "lm_head.weight"]).T
    return params


def timm_vit_params_from_hf(
    state: Dict, prefix: str, num_blocks: int
) -> Dict:
    """timm ViT layout: blocks.{i}.{norm1,attn.qkv,attn.proj,ls1,norm2,
    mlp.fc1,mlp.fc2,ls2}, patch_embed.proj, pos_embed, cls_token, reg_token.
    ``num_blocks`` limits stacking to the blocks actually executed
    (prismatic feature_layer=-2)."""
    bre = re.compile(re.escape(prefix) + r"blocks\.(\d+)\.(.+)")
    per: Dict[str, Dict[int, np.ndarray]] = {}
    for k, v in state.items():
        if m := bre.match(k):
            i = int(m.group(1))
            if i < num_blocks:
                per.setdefault(m.group(2), {})[i] = _t(v)

    def lin(name):
        return _stack({i: w.T for i, w in per[name + ".weight"].items()})

    def vec(name):
        return _stack(per[name])

    conv_w = _t(state[prefix + "patch_embed.proj.weight"])  # [D, C, p, p]
    params = {
        "patch_w": conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0]),
        "patch_b": _t(state[prefix + "patch_embed.proj.bias"]),
        "pos_embed": _t(state[prefix + "pos_embed"])[0],
        "layers": {
            "ln1_w": vec("norm1.weight"),
            "ln1_b": vec("norm1.bias"),
            "ln2_w": vec("norm2.weight"),
            "ln2_b": vec("norm2.bias"),
            "qkv_w": lin("attn.qkv"),
            "qkv_b": vec("attn.qkv.bias"),
            "out_w": lin("attn.proj"),
            "out_b": vec("attn.proj.bias"),
            "fc1_w": lin("mlp.fc1"),
            "fc1_b": vec("mlp.fc1.bias"),
            "fc2_w": lin("mlp.fc2"),
            "fc2_b": vec("mlp.fc2.bias"),
        },
    }
    if prefix + "cls_token" in state:
        params["cls_token"] = _t(state[prefix + "cls_token"])
    if prefix + "reg_token" in state:
        params["reg_tokens"] = _t(state[prefix + "reg_token"])
    if "ls1.gamma" in per:
        params["layers"]["ls1"] = vec("ls1.gamma")
        params["layers"]["ls2"] = vec("ls2.gamma")
    return params


def prismatic_vision_params(state: Dict, spec) -> Tuple[Dict, Dict]:
    """Single-backbone prismatic (MiniVLA) vision tower + projector from a
    ``.pt`` state dict: ``vision_backbone.featurizer.*`` timm keys and a
    Linear-GELU-Linear MLP projector (``projector.projector.{0,2}`` in
    prismatic naming, or ``projector.fc{1,2}``). Returns (vit, projector)
    numpy pytrees. Raises KeyError when the layout does not match."""
    vit = timm_vit_params_from_hf(
        state, "vision_backbone.featurizer.", spec.siglip.effective_num_layers
    )

    def pick(*names):
        for n in names:
            if n in state:
                return _t(state[n])
        raise KeyError(f"projector tensor not found; tried {names}")

    proj = {
        "fc1_w": pick("projector.projector.0.weight", "projector.fc1.weight").T,
        "fc1_b": pick("projector.projector.0.bias", "projector.fc1.bias"),
        "fc2_w": pick("projector.projector.2.weight", "projector.fc2.weight").T,
        "fc2_b": pick("projector.projector.2.bias", "projector.fc2.bias"),
    }
    return vit, proj


def openvla_params_from_hf_dir(path: str, spec, dtype=jnp.bfloat16,
                               merge_lora: bool = True) -> Dict:
    """Full OpenVLA snapshot dir -> parameter pytree; auto-merges a
    lora_adapter/ dir unless ``merge_lora`` is False."""
    state = load_safetensors_dir(path)

    def proj_lin(name):
        return {
            "w": _t(state[f"projector.{name}.weight"]).T,
            "b": _t(state[f"projector.{name}.bias"]),
        }

    from blurr_tpu.ops.lora import maybe_merge_lora_adapter

    llama = llama_params_from_hf(state)
    if merge_lora:
        llama = maybe_merge_lora_adapter(llama, path)
    params = {
        "llama": llama,
        "dinov2": timm_vit_params_from_hf(
            state, "vision_backbone.featurizer.", spec.dinov2.effective_num_layers
        ),
        "siglip": timm_vit_params_from_hf(
            state,
            "vision_backbone.fused_featurizer.",
            spec.siglip.effective_num_layers,
        ),
        "projector": {
            "fc1_w": proj_lin("fc1")["w"],
            "fc1_b": proj_lin("fc1")["b"],
            "fc2_w": proj_lin("fc2")["w"],
            "fc2_b": proj_lin("fc2")["b"],
            "fc3_w": proj_lin("fc3")["w"],
            "fc3_b": proj_lin("fc3")["b"],
        },
    }
    import jax

    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def load_norm_stats(path: str) -> Optional[Dict]:
    """dataset_statistics.json / config.json norm_stats from a snapshot dir
    (reference _inject_dataset_statistics_into_norm_stats semantics,
    eval_hf_vla_simpler.py:201-267)."""
    import json

    for name in ("dataset_statistics.json",):
        p = os.path.join(path, name)
        if os.path.exists(p):
            with open(p) as f:
                stats = json.load(f)
            return stats
    p = os.path.join(path, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            cfg = json.load(f)
        return cfg.get("norm_stats")
    return None


def load_dataset_statistics(path: str) -> Optional[Dict]:
    """dataset_statistics.json ONLY (no config.json fallback) — the
    reference's _load_dataset_stats (eval_hf_vla_simpler.py:190-198,
    benchmark_hf_vla.py:112-130). Distinct from load_norm_stats: the two
    scripts keep dataset statistics and model norm_stats separate and only
    the eval script injects one into the other."""
    import json

    p = os.path.join(path, "dataset_statistics.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def infer_unnorm_key(
    norm_stats: Dict,
    requested: Optional[str] = None,
    dataset_stats: Optional[Dict] = None,
    prefer_dataset_stats: bool = False,
) -> Optional[str]:
    """Reference logic: honor an explicit key (erroring when absent, the
    benchmark's validation, benchmark_hf_vla.py:228-231).

    The two reference scripts rank the fallbacks DIFFERENTLY:
      eval (eval_hf_vla_simpler.py:270-288, default here):
          'bridge_orig' > first dataset-statistics key also in norm_stats >
          first norm_stats key (json insertion order) > None
      benchmark (benchmark_hf_vla.py:217-226, prefer_dataset_stats=True):
          first dataset-statistics key also in norm_stats > 'bridge_orig' >
          first norm_stats key > None
    A fine-tuned snapshot whose dataset_statistics.json names a custom
    dataset while config.json still carries 'bridge_orig' resolves to
    DIFFERENT keys in the two scripts — callers must pick the ordering of
    the script they mirror."""
    if requested:
        if requested in norm_stats:
            return requested
        raise KeyError(f"unnorm_key {requested!r} not in norm_stats")
    inter = [k for k in (dataset_stats or {}) if k in norm_stats]
    order = (
        (inter[:1], ["bridge_orig"] if "bridge_orig" in norm_stats else [])
        if prefer_dataset_stats
        else (["bridge_orig"] if "bridge_orig" in norm_stats else [], inter[:1])
    )
    for cands in order:
        if cands:
            return cands[0]
    if norm_stats:
        return next(iter(norm_stats))
    return None



def _latest_by_step(paths):
    """Newest aux checkpoint by NUMERIC step: a lexicographic sort would
    rank action_head--9_... above --10_... (continued fine-tuning via
    save_oft_aux_params writes growing step numbers)."""
    def step_of(p):
        m = re.search(r"--(\d+)_checkpoint\.pt$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=step_of)

def load_oft_aux_params(path: str, dtype=jnp.bfloat16) -> Tuple[Optional[Dict], Optional[Dict]]:
    """action_head--*.pt / proprio_projector--*.pt -> JAX pytrees (shape-
    driven reconstruction like the reference)."""
    import torch

    import jax

    def cast(tree):
        return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)

    head = proj = None
    heads = glob.glob(os.path.join(path, "action_head--*_checkpoint.pt"))
    if heads:
        state = torch.load(_latest_by_step(heads), map_location="cpu")
        state = {
            k.removeprefix("module.model."): _t(v)
            for k, v in state.items()
            if k.startswith("module.model.")
        }
        n_blocks = len(
            {k.split(".")[1] for k in state if k.startswith("mlp_resnet_blocks.")}
        )
        head = cast(
            {
                "ln1_w": state["layer_norm1.weight"],
                "ln1_b": state["layer_norm1.bias"],
                "fc1_w": state["fc1.weight"].T,
                "fc1_b": state["fc1.bias"],
                "blocks": {
                    "ln_w": np.stack(
                        [state[f"mlp_resnet_blocks.{i}.ffn.0.weight"] for i in range(n_blocks)]
                    ),
                    "ln_b": np.stack(
                        [state[f"mlp_resnet_blocks.{i}.ffn.0.bias"] for i in range(n_blocks)]
                    ),
                    "w": np.stack(
                        [state[f"mlp_resnet_blocks.{i}.ffn.1.weight"].T for i in range(n_blocks)]
                    ),
                    "b": np.stack(
                        [state[f"mlp_resnet_blocks.{i}.ffn.1.bias"] for i in range(n_blocks)]
                    ),
                },
                "ln2_w": state["layer_norm2.weight"],
                "ln2_b": state["layer_norm2.bias"],
                "fc2_w": state["fc2.weight"].T,
                "fc2_b": state["fc2.bias"],
            }
        )
    projs = glob.glob(os.path.join(path, "proprio_projector--*_checkpoint.pt"))
    if projs:
        state = torch.load(_latest_by_step(projs), map_location="cpu")
        # proprio checkpoints prefix with "module." only (no ".model." level)
        # — reference eval_hf_vla_simpler.py:119-128
        state = {
            k.removeprefix("module."): _t(v)
            for k, v in state.items()
            if k.startswith("module.")
        }
        proj = cast(
            {
                "fc1_w": state["fc1.weight"].T,
                "fc1_b": state["fc1.bias"],
                "fc2_w": state["fc2.weight"].T,
                "fc2_b": state["fc2.bias"],
            }
        )
    return head, proj


def save_oft_aux_params(
    path: str,
    action_head: Optional[Dict] = None,
    proprio_projector: Optional[Dict] = None,
    step: int = 0,
) -> None:
    """Inverse of :func:`load_oft_aux_params`: write trained OFT aux modules
    as the torch checkpoints the reference's eval discovers in a snapshot
    dir (``action_head--{step}_checkpoint.pt`` with ``module.model.``-
    prefixed keys, ``proprio_projector--{step}_checkpoint.pt`` with
    ``module.`` — reference scripts/eval_hf_vla_simpler.py:99-128). JAX
    [in, out] layouts transpose back to torch [out, in]."""
    import torch

    def t(x):
        # np.array (copy): jax buffers are read-only; from_numpy wants writable
        return torch.from_numpy(np.array(x, np.float32))

    os.makedirs(path, exist_ok=True)
    if action_head is not None:
        h = action_head
        state = {
            "layer_norm1.weight": t(h["ln1_w"]),
            "layer_norm1.bias": t(h["ln1_b"]),
            "fc1.weight": t(h["fc1_w"]).T.contiguous(),
            "fc1.bias": t(h["fc1_b"]),
            "layer_norm2.weight": t(h["ln2_w"]),
            "layer_norm2.bias": t(h["ln2_b"]),
            "fc2.weight": t(h["fc2_w"]).T.contiguous(),
            "fc2.bias": t(h["fc2_b"]),
        }
        for i in range(h["blocks"]["w"].shape[0]):
            state[f"mlp_resnet_blocks.{i}.ffn.0.weight"] = t(h["blocks"]["ln_w"][i])
            state[f"mlp_resnet_blocks.{i}.ffn.0.bias"] = t(h["blocks"]["ln_b"][i])
            state[f"mlp_resnet_blocks.{i}.ffn.1.weight"] = (
                t(h["blocks"]["w"][i]).T.contiguous()
            )
            state[f"mlp_resnet_blocks.{i}.ffn.1.bias"] = t(h["blocks"]["b"][i])
        torch.save(
            {f"module.model.{k}": v for k, v in state.items()},
            os.path.join(path, f"action_head--{step}_checkpoint.pt"),
        )
    if proprio_projector is not None:
        p = proprio_projector
        state = {
            "fc1.weight": t(p["fc1_w"]).T.contiguous(),
            "fc1.bias": t(p["fc1_b"]),
            "fc2.weight": t(p["fc2_w"]).T.contiguous(),
            "fc2.bias": t(p["fc2_b"]),
        }
        torch.save(
            {f"module.{k}": v for k, v in state.items()},
            os.path.join(path, f"proprio_projector--{step}_checkpoint.pt"),
        )
