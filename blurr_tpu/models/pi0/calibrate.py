"""GPTQ calibration for the Pi-0 joint mixtures.

The w4a8 tier's remaining accuracy gap is rounding noise (measured ladder:
docs/results/quant_closed_loop_v5e.md). The data-free MSE-clip search is
weight-only; GPTQ (ops/gptq.py) instead minimizes the LAYER OUTPUT error
against calibration activations. This module produces those activations
from the model's own control loop and quantizes a mixture with them:

1. ``collect_pi0_calibration``: replay the naive flow loop (the reference's
   infer_action_naive semantics — every linear sees realistic inputs: vlm
   tokens from real processed observations, action tokens at every flow
   time) with ``joint.naive_forward(capture=True)``, zero out padded vlm
   positions (zero rows add nothing to X^T X), and stage the stacked
   per-layer inputs on HOST (the box has 125 GB RAM; the chip does not
   have room for [L, K, K] Hessian stacks at K=16384).
2. ``gptq_quantize_mixture``: per layer, move one [T, K] input slab back to
   the device, build the damped Hessian there (one MXU matmul), and run
   blocked GPTQ — emitting the same {"q4", "s"} dicts as
   quantize_mixture_w4a8 (mm() and the Pallas kernel are untouched).

Weight -> input mapping: q_w/k_w/v_w <- attn_in, o_w <- o_in,
gate_w/up_w <- mlp_in, down_w <- down_in.

No reference counterpart (its quant recipe is data-free int8,
reference scripts/../quantize.py); this is the round-4 verdict Next #4
calibration upgrade.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.ops import masks as mask_lib

# weight key -> captured input key (shared inputs share Hessians)
WEIGHT_INPUTS = {
    "q_w": "attn_in",
    "k_w": "attn_in",
    "v_w": "attn_in",
    "o_w": "o_in",
    "gate_w": "mlp_in",
    "up_w": "mlp_in",
    "down_w": "down_in",
}


def collect_pi0_calibration(
    model,
    params: Dict,
    batches: List[Dict],
    num_flow_steps: int = 2,
    mixtures: tuple = ("vlm", "action"),
    seed: int = 0,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Run the naive flow loop over calibration observations and return
    host-staged per-layer linear inputs: {mixture: {input_key:
    [L, T_total, K] fp32}}.

    ``model`` is a PiZeroInference (or PiZero) whose params are STILL fp —
    calibration must precede enable_*_quantization. ``batches``: dicts with
    input_ids / attention_mask / pixel_values / proprios (the eval
    processing output). The flow state advances with the model's own
    velocity between captured steps, so every flow time contributes
    realistic action-token inputs."""
    s = model.spec
    out: Dict[str, Dict[str, list]] = {n: {} for n in mixtures}

    @jax.jit
    def captured_step(params, input_ids, attention_mask, pixel_values,
                      proprios, action, t):
        bsz = input_ids.shape[0]
        full_mask = mask_lib.pi0_full_mask(
            attention_mask, s.max_image_text_tokens, s.num_proprio_tokens,
            s.num_action_tokens,
        )
        vlm_pos, proprio_pos, action_pos = mask_lib.pi0_position_ids(
            bsz, s.max_image_text_tokens, s.num_proprio_tokens,
            s.num_action_tokens,
        )
        inputs_embeds = model._embed_merge(params, input_ids, pixel_values)
        proprio_embeds = model._encode_proprio(params, proprios)
        dtype = action.dtype
        prefix_tc = None
        if s.adaptive_mode:
            prefix_tc = model._time_embedding(
                jnp.zeros((bsz,), dtype)).astype(dtype)
        time_emb = model._time_embedding(t).astype(dtype)
        time_cond = time_emb if s.adaptive_mode else None
        action_embeds = model._encode_action(params, action, time_emb)
        hidden, caps = joint_lib.naive_forward(
            model._joint_weights(params),
            model.joint_spec,
            {"vlm": inputs_embeds, "proprio": proprio_embeds,
             "action": action_embeds},
            {"vlm": vlm_pos, "proprio": proprio_pos, "action": action_pos},
            full_mask,
            time_cond,
            prefix_time_cond=prefix_tc,
            capture=True,
        )
        vel = model._decode_action(params, hidden)
        # zero padded vlm positions: their (masked-out) hidden states must
        # not pollute the Hessians; zero rows contribute nothing to X^T X
        valid = attention_mask.astype(jnp.float32)  # [B, S_vlm]
        for key, x in caps["vlm"].items():
            caps["vlm"][key] = x * valid[None, :, :, None]
        keep = {n: caps[n] for n in mixtures}
        return vel, keep

    delta_t = 1.0 / num_flow_steps
    rng = jax.random.PRNGKey(seed)
    for bi, batch in enumerate(batches):
        bsz = int(np.asarray(batch["input_ids"]).shape[0])
        rng, sub = jax.random.split(rng)
        action = jax.random.normal(
            sub, (bsz, s.num_action_tokens, s.action_dim), jnp.float32
        )
        t = jnp.zeros((bsz,), jnp.float32)
        for _ in range(num_flow_steps):
            vel, caps = captured_step(
                params, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["pixel_values"]),
                jnp.asarray(batch["proprios"]), action, t,
            )
            for n in mixtures:
                for key, x in caps[n].items():
                    # [L, B, S, K] -> host [L, B*S, K] fp32
                    arr = np.asarray(x, dtype=np.float32)
                    arr = arr.reshape(arr.shape[0], -1, arr.shape[-1])
                    out[n].setdefault(key, []).append(arr)
            action = action + delta_t * vel
            t = t + delta_t
    return {
        n: {k: np.concatenate(v, axis=1) for k, v in d.items()}
        for n, d in out.items()
    }


def gptq_quantize_mixture(
    mixture_params: Dict,
    calib: Dict[str, np.ndarray],
    group_size: int = 512,
    int8_keys: tuple = (),
    damp: float = 0.01,
) -> Dict:
    """quantize_mixture_w4a8's GPTQ twin: every linear weight becomes a
    {"q4", "s"} dict rounded with error feedback against its own per-layer
    calibration Hessian (built on-device from the host-staged inputs, one
    layer at a time — bounded memory at K=16384). Same knobs: ``int8_keys``
    keeps named weights in W8A8 (mixed precision), non-stacked 2D weights
    quantize with their single Hessian."""
    from blurr_tpu.ops.gptq import gptq_quantize_weight, hessian_from_inputs
    from blurr_tpu.ops.quant import _QUANT_WEIGHT_KEYS, quantize_weight_w8a8

    out = dict(mixture_params)
    for wkey in _QUANT_WEIGHT_KEYS:
        if wkey not in out or isinstance(out[wkey], dict):
            continue
        w = out[wkey]
        if wkey in tuple(int8_keys):
            out[wkey] = quantize_weight_w8a8(w)
            continue
        x_all = calib[WEIGHT_INPUTS[wkey]]  # [L, T, K] (or [T, K])
        if w.ndim == 3:
            qs = []
            for layer in range(w.shape[0]):
                h = hessian_from_inputs(jnp.asarray(x_all[layer]), damp=damp)
                qs.append(gptq_quantize_weight(w[layer], h, group_size))
                del h
            out[wkey] = jax.tree.map(lambda *ls: jnp.stack(ls), *qs)
        else:
            h = hessian_from_inputs(jnp.asarray(x_all), damp=damp)
            out[wkey] = gptq_quantize_weight(w, h, group_size)
    return out


def gptq_quantize_pi0(
    model,
    params: Dict,
    batches: List[Dict],
    num_flow_steps: int = 2,
    group_size: Optional[int] = None,
    seed: int = 0,
) -> Dict:
    """End-to-end GPTQ twin of enable_vlm_quantization +
    enable_action_quantization for the w4a8 presets: calibrate on
    ``batches`` (fp params — calibration must run BEFORE quantization) and
    return params with the VLM + action mixtures GPTQ-w4a8-quantized,
    honoring the cfg's group_size/int8_keys knobs, the proprio->action tie
    (a tied proprio mixture follows the quantized action arrays, exactly
    like enable_action_quantization), and include_vision (SigLIP stays
    int8 under w4a8 — small weights, int8 accuracy)."""
    from blurr_tpu.models.pi0.trainable import _subtrees_tied
    from blurr_tpu.ops.quant import quantize_vit_w8a8

    tied = _subtrees_tied(
        params["joint"].get("proprio"), params["joint"].get("action")
    )
    calib = collect_pi0_calibration(
        model, params, batches, num_flow_steps=num_flow_steps, seed=seed,
        mixtures=("vlm", "action", "proprio") if tied else ("vlm", "action"),
    )
    if tied:
        # tied weights process the proprio tokens too — their inputs belong
        # in the shared Hessian
        calib["action"] = {
            k: np.concatenate([v, calib["proprio"][k]], axis=1)
            for k, v in calib["action"].items()
        }
    out = dict(params)
    joint = dict(params["joint"])
    for n in ("vlm", "action"):
        gs = group_size
        if gs is None:
            gs = (model.vlm_w4a8_group_size if n == "vlm"
                  else model.action_w4a8_group_size)
        keys = (model.vlm_w4a8_int8_keys if n == "vlm"
                else model.action_w4a8_int8_keys)
        joint[n] = gptq_quantize_mixture(
            joint[n], calib[n], group_size=gs, int8_keys=keys
        )
    if tied:
        joint["proprio"] = joint["action"]
    if getattr(model, "vlm_quant_vision", False):
        out["siglip"] = quantize_vit_w8a8(params["siglip"])
    out["joint"] = joint
    return out
