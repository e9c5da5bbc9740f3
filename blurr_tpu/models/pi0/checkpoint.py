"""Checkpoint bridge: PyTorch Pi-0 checkpoints / PaliGemma safetensors -> JAX.

Reads the exact on-disk formats the reference consumes — ``torch.load(.pt)
["model"]`` with ``_orig_mod.`` stripping (reference src/agent/eval.py:308-316)
and PaliGemma ``*.safetensors`` with the ``language_model.model.`` /
``vision_tower.`` key remaps (reference src/model/vla/pizero.py:168-230) — and
transposes into this framework's parameter pytree:

- torch ``nn.Linear`` stores W as [out, in]; JAX matmul convention here is
  y = x @ W with W [in, out], so every linear weight is transposed.
- the SigLIP patch conv [D, C, p, p] becomes the conv-as-matmul weight
  [p*p*C, D] (permute (2, 3, 1, 0) then flatten).
- per-layer weights are stacked onto the leading [L, ...] scan axis.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Dict

import numpy as np

import jax.numpy as jnp

log = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (keeping fp32; dtype cast happens at the end)."""
    return x.detach().to("cpu").float().numpy()


def load_torch_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    import torch

    data = torch.load(path, weights_only=True, map_location="cpu")
    state = data["model"] if isinstance(data, dict) and "model" in data else data
    return {k.replace("_orig_mod.", ""): v for k, v in state.items()}


def load_safetensors_dir(path: str) -> Dict[str, "np.ndarray"]:
    import glob

    from safetensors import safe_open

    tensors = {}
    for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(f, framework="pt", device="cpu") as fh:
            for key in fh.keys():
                tensors[key] = fh.get_tensor(key)
    return tensors


def _stack(layers: Dict[int, np.ndarray]) -> np.ndarray:
    idxs = sorted(layers)
    assert idxs == list(range(len(idxs))), f"missing layers: {idxs}"
    return np.stack([layers[i] for i in idxs])


def _siglip_params_from_torch(state: Dict, prefix: str) -> Dict:
    """prefix e.g. 'vision_tower.vision_model.'"""
    g = lambda k: _t(state[prefix + k])
    conv_w = g("embeddings.patch_embedding.weight")  # [D, C, p, p]
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])

    layer_re = re.compile(re.escape(prefix) + r"encoder\.layers\.(\d+)\.(.+)")
    per = {}
    for k, v in state.items():
        m = layer_re.match(k)
        if m:
            per.setdefault(m.group(2), {})[int(m.group(1))] = _t(v)

    def lin(name):
        return _stack({i: w.T for i, w in per[name + ".weight"].items()})

    def vec(name):
        return _stack(per[name])

    layers = {
        "ln1_w": vec("layer_norm1.weight"),
        "ln1_b": vec("layer_norm1.bias"),
        "ln2_w": vec("layer_norm2.weight"),
        "ln2_b": vec("layer_norm2.bias"),
        "q_w": lin("self_attn.q_proj"),
        "q_b": vec("self_attn.q_proj.bias"),
        "k_w": lin("self_attn.k_proj"),
        "k_b": vec("self_attn.k_proj.bias"),
        "v_w": lin("self_attn.v_proj"),
        "v_b": vec("self_attn.v_proj.bias"),
        "out_w": lin("self_attn.out_proj"),
        "out_b": vec("self_attn.out_proj.bias"),
        "fc1_w": lin("mlp.fc1"),
        "fc1_b": vec("mlp.fc1.bias"),
        "fc2_w": lin("mlp.fc2"),
        "fc2_b": vec("mlp.fc2.bias"),
    }
    return {
        "patch_w": patch_w,
        "patch_b": g("embeddings.patch_embedding.bias"),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "layers": layers,
        "post_ln_w": g("post_layernorm.weight"),
        "post_ln_b": g("post_layernorm.bias"),
    }


def _mixture_params_from_torch(state: Dict, prefix: str) -> Dict:
    """prefix e.g. 'joint_model.mixtures.vlm.' (Gemma decoder-layer format)."""
    layer_re = re.compile(re.escape(prefix) + r"layers\.(\d+)\.(.+)")
    per = {}
    for k, v in state.items():
        m = layer_re.match(k)
        if m:
            per.setdefault(m.group(2), {})[int(m.group(1))] = _t(v)

    def lin(name):
        return _stack({i: w.T for i, w in per[name + ".weight"].items()})

    params = {
        "q_w": lin("self_attn.q_proj"),
        "k_w": lin("self_attn.k_proj"),
        "v_w": lin("self_attn.v_proj"),
        "o_w": lin("self_attn.o_proj"),
        "gate_w": lin("mlp.gate_proj"),
        "up_w": lin("mlp.up_proj"),
        "down_w": lin("mlp.down_proj"),
    }
    if "input_layernorm.weight" in per:  # Gemma RMSNorm
        params["input_norm"] = {"scale": _stack(per["input_layernorm.weight"])}
        params["post_norm"] = {
            "scale": _stack(per["post_attention_layernorm.weight"])
        }
    else:  # adaptive (adaLN / adaLN-Zero)
        def ada(name):
            return {
                "to_gamma_w": _stack(
                    {i: w.T for i, w in per[f"{name}.to_gamma.0.weight"].items()}
                ),
                "to_gamma_b": _stack(per[f"{name}.to_gamma.0.bias"]),
                "to_beta_w": _stack(
                    {i: w.T for i, w in per[f"{name}.to_beta.weight"].items()}
                ),
            }

        params["input_norm"] = ada("input_layernorm")
        params["post_norm"] = ada("post_attention_layernorm")
        if "post_adaptive_scale.to_adaln_zero_gamma.weight" in per:
            for ours, theirs in (
                ("post_scale", "post_adaptive_scale"),
                ("final_scale", "final_adaptive_scale"),
            ):
                params[ours] = {
                    "gamma_w": _stack(
                        {
                            i: w.T
                            for i, w in per[
                                f"{theirs}.to_adaln_zero_gamma.weight"
                            ].items()
                        }
                    ),
                    "gamma_b": _stack(per[f"{theirs}.to_adaln_zero_gamma.bias"]),
                }
    final_key = prefix + "norm.weight"
    if final_key in state:
        params["final_norm"] = {"scale": _t(state[final_key])}
    elif prefix + "norm.to_gamma.0.weight" in state:
        # adaptive final norm (AdaptiveRMSNorm, reference modules.py:78-99):
        # unstacked to_gamma/to_beta — matches joint.init_mixture_params'
        # nl=None structure
        params["final_norm"] = {
            "to_gamma_w": _t(state[prefix + "norm.to_gamma.0.weight"]).T,
            "to_gamma_b": _t(state[prefix + "norm.to_gamma.0.bias"]),
            "to_beta_w": _t(state[prefix + "norm.to_beta.weight"]).T,
        }
    return params


def pizero_params_from_torch_checkpoint(path: str, dtype=jnp.bfloat16) -> Dict:
    """Full Pi-0 ``.pt`` checkpoint -> parameter pytree (all model pieces)."""
    state = load_torch_state_dict(path)

    def lin(name):
        return {"w": _t(state[name + ".weight"]).T, "b": _t(state[name + ".bias"])}

    params = {
        "embed_tokens": _t(state["embed_tokens.weight"]),
        "siglip": _siglip_params_from_torch(state, "vision_tower.vision_model."),
        "projector": lin("multi_modal_projector.linear"),
        "joint": {
            name: _mixture_params_from_torch(
                state, f"joint_model.mixtures.{name}."
            )
            for name in ("vlm", "proprio", "action")
        },
        "action_encoder": {
            "w1": _t(state["action_encoder.linear_1.weight"]).T,
            "b1": _t(state["action_encoder.linear_1.bias"]),
            "w2": _t(state["action_encoder.linear_2.weight"]).T,
            "b2": _t(state["action_encoder.linear_2.bias"]),
            "w3": _t(state["action_encoder.linear_3.weight"]).T,
            "b3": _t(state["action_encoder.linear_3.bias"]),
        },
        "proprio_encoder": lin("proprio_encoder"),
        "action_decoder": lin("action_decoder"),
    }
    return jnp_cast(params, dtype)


def paligemma_params_from_safetensors(path: str, dtype=jnp.bfloat16) -> Dict:
    """PaliGemma pretrained weights -> partial pytree (embed tokens, vision
    tower, projector, vlm mixture incl. final norm), mirroring the reference's
    load_pretrained_weights key remaps (pizero.py:168-230)."""
    state = load_safetensors_dir(path)
    params = {
        "embed_tokens": _t(state["language_model.model.embed_tokens.weight"]),
        "siglip": _siglip_params_from_torch(state, "vision_tower.vision_model."),
        "projector": {
            "w": _t(state["multi_modal_projector.linear.weight"]).T,
            "b": _t(state["multi_modal_projector.linear.bias"]),
        },
        "joint": {
            "vlm": _mixture_params_from_torch(state, "language_model.model.")
        },
    }
    return jnp_cast(params, dtype)


def jnp_cast(tree, dtype):
    import jax

    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)


# ---------------------------------------------------------------------------
# Native save/restore (capability extension: the reference is load-only,
# SURVEY.md §5 checkpoint/resume)
# ---------------------------------------------------------------------------


def save_params(params, path: str) -> None:
    """Save a parameter pytree with orbax (async-safe, multi-host aware)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def restore_params(path: str, like=None):
    """Restore a pytree saved by save_params; ``like`` (a pytree of arrays or
    ShapeDtypeStructs) guides dtypes/sharding when given."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(
            os.path.abspath(path), target=_template_like(like)
        )
    return ckptr.restore(os.path.abspath(path))


def _template_like(tree):
    """ShapeDtypeStruct template carrying each leaf's sharding when it has
    one, so orbax restores sharded trees PLACED (a multi-chip state larger
    than one chip would otherwise OOM restoring unsharded, and single-chip
    restores would pay a full re-transfer at the next jit)."""
    import jax
    from jax.sharding import Sharding

    def mk(a):
        sh = getattr(a, "sharding", None)
        if isinstance(sh, Sharding):
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    return jax.tree.map(mk, tree)


def save_train_state(path: str, params, opt_state, step: int, rng) -> None:
    """Save the COMPLETE training state — params, optimizer state (adamw
    moments, MultiSteps accumulators/counters), step index, and the jax PRNG
    key — for EXACT resume (capability extension; reference is load-only).
    The caller must also resynchronize its data stream to ``step`` (the CLI
    fast-forwards its batch RNG by replaying ``step`` draws)."""
    import orbax.checkpoint as ocp

    state = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.asarray(step, jnp.int32),  # x64 is disabled by default
        "rng": rng,
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def restore_train_state(path: str, like_params, like_opt_state, like_rng):
    """Restore a save_train_state tree. Returns (params, opt_state, step,
    rng). ``like_*`` provide the target structure (build like_opt_state
    with ``tx.init(like_params)`` from the same optimizer configuration)."""
    import orbax.checkpoint as ocp

    template = _template_like(
        {
            "params": like_params,
            "opt_state": like_opt_state,
            "step": jnp.asarray(0, jnp.int32),
            "rng": like_rng,
        }
    )
    state = ocp.StandardCheckpointer().restore(
        os.path.abspath(path), target=template
    )
    return (
        state["params"],
        state["opt_state"],
        int(state["step"]),
        state["rng"],
    )
