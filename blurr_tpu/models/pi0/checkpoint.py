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


def load_pizero_params_auto(path: str, dtype=jnp.bfloat16):
    """Dispatch on the checkpoint kind: a torch ``.pt`` file goes through
    the reference bridge; a DIRECTORY is an orbax tree saved by
    ``save_params`` (what train_pi0_flow.py --save-dir writes — including
    LoRA-merged plain trees and QLoRA adapter-dict trees, which
    ``ops.quant.mm`` serves directly). Float leaves cast to ``dtype``
    EXCEPT quantized/LoRA scale leaves, which stay fp32
    (cast_floating_preserving_scales); int payloads keep their dtype."""
    import jax

    if os.path.isdir(path):
        from blurr_tpu.utils.optim import cast_floating_preserving_scales

        params = restore_params(path)
        return cast_floating_preserving_scales(params, dtype)
    return pizero_params_from_torch_checkpoint(path, dtype=dtype)


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


class TrainCheckpointManager:
    """Periodic ASYNC training-state checkpoints with retention — the
    crash-safety layer the end-of-run ``--save-state`` cannot provide.

    Wraps an orbax ``CheckpointManager``: step-numbered subdirs under
    ``root``, ``keep`` newest checkpoints retained, and async persistence
    — ``save()`` blocks only for the device→host snapshot (orbax's async
    contract), after which the donated train step may immediately reuse
    the buffers while serialization drains in a background thread. An
    interrupted write is left as an orbax tmp dir and skipped by
    ``latest_step()``, so a crash-restart resumes from the newest
    COMPLETE step.

    The state tree and resume semantics are identical to
    ``save_train_state`` / ``restore_train_state`` (capability extension;
    the reference stack is load-only and has no trainer)."""

    def __init__(self, root: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(root),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, params, opt_state, rng) -> None:
        state = {
            "params": params,
            "opt_state": opt_state,
            "step": jnp.asarray(step, jnp.int32),
            "rng": rng,
        }
        self._mgr.save(step, args=self._ocp.args.StandardSave(state))

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, like_params, like_opt_state, like_rng, step=None):
        """Restore (params, opt_state, step, rng) from ``step`` (default:
        the latest complete one). ``like_*`` as restore_train_state."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                "no complete checkpoint step in the manager root"
            )
        template = _template_like(
            {
                "params": like_params,
                "opt_state": like_opt_state,
                "step": jnp.asarray(0, jnp.int32),
                "rng": like_rng,
            }
        )
        state = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )
        return (
            state["params"],
            state["opt_state"],
            int(state["step"]),
            state["rng"],
        )

    def close(self) -> None:
        """Drain in-flight async writes and release the manager."""
        self._mgr.wait_until_finished()
        self._mgr.close()


def is_manager_root(path: str) -> bool:
    """True when ``path`` is a TrainCheckpointManager root (step-numbered
    subdirectories) rather than a single save_train_state tree — lets
    ``--resume-state`` accept either without a flag."""
    if not os.path.isdir(path):
        return False
    return any(
        e.isdigit() and os.path.isdir(os.path.join(path, e))
        for e in os.listdir(path)
    )


# ---------------------------------------------------------------------------
# JAX -> torch export (capability extension: the reference is load-only; this
# closes the interop loop — weights trained/quantize-prepped here deploy on
# the reference stack unchanged). Exact inverse of
# pizero_params_from_torch_checkpoint: same key names
# (reference src/model/vla/pizero.py module tree), [in, out] -> [out, in]
# transposes undone, the [L, ...] scan stacks unstacked into per-layer keys.
# ---------------------------------------------------------------------------


def _n(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _siglip_state_from_params(sig: Dict, prefix: str, out: Dict) -> None:
    patch_w = _n(sig["patch_w"])  # [p*p*C, D] <- conv [D, C, p, p]
    d = patch_w.shape[1]
    p = int(round((patch_w.shape[0] // 3) ** 0.5))
    assert p * p * 3 == patch_w.shape[0], patch_w.shape
    out[prefix + "embeddings.patch_embedding.weight"] = (
        patch_w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
    )
    out[prefix + "embeddings.patch_embedding.bias"] = _n(sig["patch_b"])
    out[prefix + "embeddings.position_embedding.weight"] = _n(sig["pos_embed"])
    out[prefix + "post_layernorm.weight"] = _n(sig["post_ln_w"])
    out[prefix + "post_layernorm.bias"] = _n(sig["post_ln_b"])
    names = {
        "ln1_w": "layer_norm1.weight", "ln1_b": "layer_norm1.bias",
        "ln2_w": "layer_norm2.weight", "ln2_b": "layer_norm2.bias",
        "q_w": "self_attn.q_proj.weight", "q_b": "self_attn.q_proj.bias",
        "k_w": "self_attn.k_proj.weight", "k_b": "self_attn.k_proj.bias",
        "v_w": "self_attn.v_proj.weight", "v_b": "self_attn.v_proj.bias",
        "out_w": "self_attn.out_proj.weight",
        "out_b": "self_attn.out_proj.bias",
        "fc1_w": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
        "fc2_w": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
    }
    layers = sig["layers"]
    n_layers = next(iter(layers.values())).shape[0]
    for i in range(n_layers):
        for ours, theirs in names.items():
            v = _n(layers[ours][i])
            if ours.endswith("_w") and not ours.startswith("ln"):
                v = v.T  # linear weights back to torch [out, in]
            out[f"{prefix}encoder.layers.{i}.{theirs}"] = v


def _mixture_state_from_params(mix: Dict, prefix: str, out: Dict) -> None:
    lin_names = {
        "q_w": "self_attn.q_proj.weight", "k_w": "self_attn.k_proj.weight",
        "v_w": "self_attn.v_proj.weight", "o_w": "self_attn.o_proj.weight",
        "gate_w": "mlp.gate_proj.weight", "up_w": "mlp.up_proj.weight",
        "down_w": "mlp.down_proj.weight",
    }
    n_layers = _n(mix["q_w"]).shape[0]
    for i in range(n_layers):
        for ours, theirs in lin_names.items():
            out[f"{prefix}layers.{i}.{theirs}"] = _n(mix[ours][i]).T
        if "scale" in mix["input_norm"]:  # plain Gemma RMSNorm
            out[f"{prefix}layers.{i}.input_layernorm.weight"] = _n(
                mix["input_norm"]["scale"][i]
            )
            out[f"{prefix}layers.{i}.post_attention_layernorm.weight"] = _n(
                mix["post_norm"]["scale"][i]
            )
        else:  # adaptive (adaLN / adaLN-Zero)
            for ours, theirs in (
                ("input_norm", "input_layernorm"),
                ("post_norm", "post_attention_layernorm"),
            ):
                ada = mix[ours]
                out[f"{prefix}layers.{i}.{theirs}.to_gamma.0.weight"] = _n(
                    ada["to_gamma_w"][i]
                ).T
                out[f"{prefix}layers.{i}.{theirs}.to_gamma.0.bias"] = _n(
                    ada["to_gamma_b"][i]
                )
                out[f"{prefix}layers.{i}.{theirs}.to_beta.weight"] = _n(
                    ada["to_beta_w"][i]
                ).T
            if "post_scale" in mix:
                for ours, theirs in (
                    ("post_scale", "post_adaptive_scale"),
                    ("final_scale", "final_adaptive_scale"),
                ):
                    out[
                        f"{prefix}layers.{i}.{theirs}.to_adaln_zero_gamma.weight"
                    ] = _n(mix[ours]["gamma_w"][i]).T
                    out[
                        f"{prefix}layers.{i}.{theirs}.to_adaln_zero_gamma.bias"
                    ] = _n(mix[ours]["gamma_b"][i])
    fn = mix.get("final_norm")
    if fn is not None:
        if "scale" in fn:
            out[prefix + "norm.weight"] = _n(fn["scale"])
        else:  # AdaptiveRMSNorm (reference modules.py:78-99)
            out[prefix + "norm.to_gamma.0.weight"] = _n(fn["to_gamma_w"]).T
            out[prefix + "norm.to_gamma.0.bias"] = _n(fn["to_gamma_b"])
            out[prefix + "norm.to_beta.weight"] = _n(fn["to_beta_w"]).T


def torch_state_dict_from_pizero_params(params: Dict) -> Dict:
    """Parameter pytree -> reference-format flat state dict (numpy fp32
    values; ``save_torch_checkpoint`` tensorizes). A training-canonical tree
    (tied proprio mixture = None) exports the action weights under BOTH
    mixtures' keys, which is exactly what the reference's torch state_dict
    contains when the Parameters are shared."""
    joint = dict(params["joint"])
    if joint.get("proprio") is None:  # canonical tied form
        joint["proprio"] = joint["action"]

    out: Dict[str, np.ndarray] = {}
    out["embed_tokens.weight"] = _n(params["embed_tokens"])
    _siglip_state_from_params(
        params["siglip"], "vision_tower.vision_model.", out
    )
    out["multi_modal_projector.linear.weight"] = _n(params["projector"]["w"]).T
    out["multi_modal_projector.linear.bias"] = _n(params["projector"]["b"])
    for name in ("vlm", "proprio", "action"):
        _mixture_state_from_params(
            joint[name], f"joint_model.mixtures.{name}.", out
        )
    enc = params["action_encoder"]
    for n_ in (1, 2, 3):
        out[f"action_encoder.linear_{n_}.weight"] = _n(enc[f"w{n_}"]).T
        out[f"action_encoder.linear_{n_}.bias"] = _n(enc[f"b{n_}"])
    for ours, theirs in (("proprio_encoder", "proprio_encoder"),
                         ("action_decoder", "action_decoder")):
        out[theirs + ".weight"] = _n(params[ours]["w"]).T
        out[theirs + ".bias"] = _n(params[ours]["b"])
    return out


def save_torch_checkpoint(params: Dict, path: str) -> None:
    """Write a reference-loadable ``.pt`` checkpoint ({"model": state_dict},
    the format load_torch_state_dict / the reference's eval.py:308-316
    consume). Values are fp32 torch tensors regardless of the tree's compute
    dtype — the reference casts at load time."""
    import torch

    state = {
        # copy=True: jnp-backed buffers arrive read-only and torch.from_numpy
        # warns on (and would alias) them
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in torch_state_dict_from_pizero_params(params).items()
    }
    torch.save({"model": state}, path)
