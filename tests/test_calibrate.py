"""GPTQ calibration for the Pi-0 joint mixtures (models/pi0/calibrate.py).

Covers: the capture plumbing is a pure observer (capture=True returns the
same hidden states), the end-to-end gptq_quantize_pi0 emits a tree that is
structurally identical to the data-free w4a8 path (so every downstream
consumer — mm(), the Pallas kernel, serving, TP repack — is untouched),
the proprio tie survives, and the quantized model still infers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.models.pi0.calibrate import (
    collect_pi0_calibration,
    gptq_quantize_pi0,
)
from blurr_tpu.models.pi0.pizero import PiZeroInference
from tests.util import tiny_inputs, tiny_pi0_cfg


def _w4a8_cfg():
    cfg = tiny_pi0_cfg()
    cfg["vlm_quantization"] = {"mode": "w4a8", "include_vision": True}
    cfg["action_quantization"] = {"mode": "w4a8"}
    return cfg


@pytest.fixture(scope="module")
def model_params_batch():
    cfg = _w4a8_cfg()
    model = PiZeroInference(cfg)
    params = model.tie_action_proprio_weights(
        model.init_params(jax.random.PRNGKey(0))
    )
    batch = tiny_inputs(cfg)
    return model, params, batch


def test_capture_is_a_pure_observer(model_params_batch):
    """naive_forward(capture=True) must return the identical action hidden
    states as capture=False — the calibration hook cannot perturb the
    model — and the captured inputs carry the documented [L, B, S, K]
    shapes with padded vlm rows zeroed by the collector."""
    model, params, batch = model_params_batch
    a_plain = model.infer_action_naive(
        params, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["proprios"], batch["noise"],
    )
    calib = collect_pi0_calibration(
        model, params, [batch], num_flow_steps=2, mixtures=("vlm", "action")
    )
    # same model, same weights: a second plain run must still agree (the
    # capture path imported nothing stateful)
    a_again = model.infer_action_naive(
        params, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["proprios"], batch["noise"],
    )
    np.testing.assert_array_equal(np.asarray(a_again), np.asarray(a_plain))

    nl = model.joint_spec.num_hidden_layers
    h_vlm = model.joint_spec.mixtures["vlm"].hidden_size
    b, s = np.asarray(batch["input_ids"]).shape
    t_total = 2 * b * s  # 2 flow steps, one batch
    assert calib["vlm"]["attn_in"].shape == (nl, t_total, h_vlm)
    # padded vlm positions contribute zero rows
    am = np.asarray(batch["attention_mask"]).reshape(-1).astype(bool)
    x0 = calib["vlm"]["attn_in"][0, : b * s]
    assert np.all(x0[~am] == 0.0)
    assert np.any(x0[am] != 0.0)


def test_gptq_tree_matches_data_free_structure(model_params_batch):
    """gptq_quantize_pi0's output must be leaf-for-leaf structurally equal
    (paths, shapes, dtypes) to enable_vlm_quantization +
    enable_action_quantization — a drop-in tree — and preserve the
    proprio->action tie as aliasing."""
    model, params, batch = model_params_batch
    ref = model.enable_action_quantization(model.enable_vlm_quantization(params))
    got = gptq_quantize_pi0(model, params, [batch], num_flow_steps=1)

    ref_leaves = jax.tree.leaves_with_path(ref)
    got_leaves = jax.tree.leaves_with_path(got)
    assert len(ref_leaves) == len(got_leaves)
    for (pr, lr), (pg, lg) in zip(ref_leaves, got_leaves):
        assert pr == pg
        assert lr.shape == lg.shape, (pr, lr.shape, lg.shape)
        assert lr.dtype == lg.dtype, (pr, lr.dtype, lg.dtype)
    assert got["joint"]["proprio"] is got["joint"]["action"]

    # the quantized model serves actions close to the fp model's
    a_fp = model.infer_action_naive(
        params, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["proprios"], batch["noise"],
    )
    a_q = model.infer_action_naive(
        got, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["proprios"], batch["noise"],
    )
    assert np.isfinite(np.asarray(a_q)).all()
    mae = float(np.mean(np.abs(np.asarray(a_q) - np.asarray(a_fp))))
    mae_ref = float(np.mean(np.abs(np.asarray(
        model.infer_action_naive(
            ref, batch["input_ids"], batch["attention_mask"],
            batch["pixel_values"], batch["proprios"], batch["noise"],
        )
    ) - np.asarray(a_fp))))
    # int4 noise at tiny dims is large for both recipes; GPTQ must at least
    # stay in the same error regime as the data-free path (the accuracy
    # ordering itself is measured on-chip at full dims — the ops-level
    # guarantee is tests/test_gptq.py::test_gptq_beats_rtn_on_correlated_data)
    assert mae < 5 * max(mae_ref, 1e-6), (mae, mae_ref)
