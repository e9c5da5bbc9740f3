"""End-to-end action parity: the reference's full torch PiZero vs blurr's.

Instantiates the reference ``PiZero`` (reference src/model/vla/pizero.py) at
tiny dims from the SAME config schema the blurr model uses, bridges every
weight across, and asserts the final integrated actions match to fp32
tolerance for:

- infer_action (prefix-cached flow integration, pizero.py:473-547)
- infer_action_naive (no-cache ablation, pizero.py:549-614)
- forward (flow-matching training loss, pizero.py:664-718)
- the adaptive (adaLN / adaLN-Zero) naive path

The reference samples its starting noise internally with ``torch.randn``; the
tests seed torch, pre-sample the identical noise for the JAX side, then
re-seed before the reference call.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from blurr_tpu.models.pi0.pizero import PiZero  # noqa: E402
from blurr_tpu.utils.reference_bridge import (  # noqa: E402
    bridge_pizero,
    build_ref_pizero,
    load_reference,
    t2n,
)
from tests.util import tiny_inputs, tiny_pi0_cfg  # noqa: E402

ref = load_reference()
torch = ref.torch
torch.set_grad_enabled(False)


def randomize_(module, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        p.data = torch.randn(p.shape, generator=g) * scale


def build_pair(seed=0, **cfg_overrides):
    cfg = tiny_pi0_cfg(**cfg_overrides)
    ref_model = build_ref_pizero(cfg)
    randomize_(ref_model, seed=seed)
    mine = PiZero(cfg)
    params = jax.tree.map(jnp.asarray, bridge_pizero(ref_model))
    return ref_model, mine, params, cfg


def torch_inputs(inp):
    return {
        "input_ids": torch.tensor(np.asarray(inp["input_ids"]), dtype=torch.long),
        "attention_mask": torch.tensor(
            np.asarray(inp["attention_mask"]), dtype=torch.long
        ),
        "pixel_values": torch.tensor(np.asarray(inp["pixel_values"])),
        "proprios": torch.tensor(np.asarray(inp["proprios"])),
    }


def ref_mask_bundle(ref_model, attention_mask_t):
    full, vlm_pos, prop_pos, act_pos = (
        ref_model.build_causal_mask_and_position_ids(
            attention_mask_t, torch.float32
        )
    )
    prefix, action = ref_model.split_full_mask_into_submasks(full)
    return full, prefix, action, vlm_pos, prop_pos, act_pos


def close(a, b, atol=5e-5, rtol=5e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol, rtol=rtol
    )


class TestE2EActions:
    def test_infer_action(self):
        ref_model, mine, params, cfg = build_pair(seed=0)
        inp = tiny_inputs(cfg)
        tin = torch_inputs(inp)
        _, prefix, action_m, vlm_pos, prop_pos, act_pos = ref_mask_bundle(
            ref_model, tin["attention_mask"]
        )
        bsz = tin["input_ids"].shape[0]
        torch.manual_seed(123)
        noise = torch.randn(bsz, cfg["horizon_steps"], cfg["action_dim"])
        torch.manual_seed(123)
        out_ref = ref_model.infer_action(
            tin["input_ids"],
            tin["pixel_values"],
            prefix,
            action_m,
            vlm_pos,
            prop_pos,
            act_pos,
            tin["proprios"],
        )
        out_mine = mine.infer_action(
            params,
            inp["input_ids"],
            inp["attention_mask"],
            inp["pixel_values"],
            inp["proprios"],
            jnp.asarray(t2n(noise)),
        )
        close(out_mine, t2n(out_ref))

    def test_infer_action_naive(self):
        ref_model, mine, params, cfg = build_pair(seed=1)
        inp = tiny_inputs(cfg, rng_seed=2)
        tin = torch_inputs(inp)
        full, *_rest, vlm_pos, prop_pos, act_pos = (
            ref_mask_bundle(ref_model, tin["attention_mask"])[i]
            for i in (0, 1, 3, 4, 5)
        )
        bsz = tin["input_ids"].shape[0]
        torch.manual_seed(321)
        noise = torch.randn(bsz, cfg["horizon_steps"], cfg["action_dim"])
        torch.manual_seed(321)
        out_ref = ref_model.infer_action_naive(
            tin["input_ids"],
            tin["pixel_values"],
            full,
            vlm_pos,
            prop_pos,
            act_pos,
            tin["proprios"],
        )
        out_mine = mine.infer_action_naive(
            params,
            inp["input_ids"],
            inp["attention_mask"],
            inp["pixel_values"],
            inp["proprios"],
            jnp.asarray(t2n(noise)),
        )
        close(out_mine, t2n(out_ref))

    def test_flow_matching_loss(self):
        ref_model, mine, params, cfg = build_pair(seed=2)
        inp = tiny_inputs(cfg, rng_seed=3)
        tin = torch_inputs(inp)
        full, *_r, vlm_pos, prop_pos, act_pos = (
            ref_mask_bundle(ref_model, tin["attention_mask"])[i]
            for i in (0, 1, 3, 4, 5)
        )
        bsz = tin["input_ids"].shape[0]
        rng = np.random.RandomState(9)
        actions = rng.randn(bsz, cfg["horizon_steps"], cfg["action_dim"]).astype(
            np.float32
        )
        t = rng.uniform(0.05, 0.95, bsz).astype(np.float32)
        torch.manual_seed(777)
        x0 = torch.randn(bsz, cfg["horizon_steps"], cfg["action_dim"])
        torch.manual_seed(777)
        loss_ref = ref_model(
            tin["input_ids"],
            tin["pixel_values"],
            full,
            vlm_pos,
            prop_pos,
            act_pos,
            tin["proprios"],
            torch.tensor(actions),
            torch.tensor(t),
        )
        loss_mine = mine.flow_loss(
            params,
            inp["input_ids"],
            inp["attention_mask"],
            inp["pixel_values"],
            inp["proprios"],
            jnp.asarray(actions),
            jnp.asarray(t),
            jnp.asarray(t2n(x0)),
        )
        close(loss_mine, t2n(loss_ref), atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("mode", ["adaLN", "adaLN-Zero"])
    def test_adaptive_naive(self, mode):
        overrides = {"action_expert_adaptive_mode": mode}
        cfg = tiny_pi0_cfg(**overrides)
        cfg["mixture"]["proprio"]["adaptive_mode"] = mode
        cfg["mixture"]["action"]["adaptive_mode"] = mode
        cfg["joint"]["config"]["action_expert_adaptive_mode"] = mode
        cfg["joint"]["config"]["mixture"] = cfg["mixture"]
        ref_model = build_ref_pizero(cfg)
        randomize_(ref_model, seed=5)
        mine = PiZero(cfg)
        params = jax.tree.map(jnp.asarray, bridge_pizero(ref_model))

        inp = tiny_inputs(cfg, rng_seed=4)
        tin = torch_inputs(inp)
        full, *_r, vlm_pos, prop_pos, act_pos = (
            ref_mask_bundle(ref_model, tin["attention_mask"])[i]
            for i in (0, 1, 3, 4, 5)
        )
        bsz = tin["input_ids"].shape[0]
        torch.manual_seed(555)
        noise = torch.randn(bsz, cfg["horizon_steps"], cfg["action_dim"])
        torch.manual_seed(555)
        out_ref = ref_model.infer_action_naive(
            tin["input_ids"],
            tin["pixel_values"],
            full,
            vlm_pos,
            prop_pos,
            act_pos,
            tin["proprios"],
        )
        out_mine = mine.infer_action_naive(
            params,
            inp["input_ids"],
            inp["attention_mask"],
            inp["pixel_values"],
            inp["proprios"],
            jnp.asarray(t2n(noise)),
        )
        close(out_mine, t2n(out_ref))
