"""INT8 quantization: dequant error bounds and end-to-end action agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.ops.quant import (
    dequantize_kv,
    mm,
    quantize_kv_int8,
    quantize_weight_int8,
)
from tests.util import tiny_inputs, tiny_pi0_cfg


def test_weight_int8_roundtrip_error():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    q = quantize_weight_int8(w)
    deq = np.asarray(q["q"], np.float32) * np.asarray(q["s"])[None, :]
    # per-out-channel symmetric int8: error <= scale/2 per element
    scale = np.asarray(q["s"])
    assert (np.abs(deq - np.asarray(w)) <= scale[None, :] * 0.5 + 1e-7).all()


def test_mm_quantized_close_to_dense():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    dense = x @ w
    quant = mm(x, quantize_weight_int8(w))
    rel = np.abs(np.asarray(quant - dense)).max() / np.abs(np.asarray(dense)).max()
    assert rel < 0.02


def test_mm_cached_fp_mode():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    q = quantize_weight_int8(w, cache_fp_dtype=jnp.float32)
    assert "fp" in q
    np.testing.assert_allclose(
        np.asarray(mm(x, q)), np.asarray(x @ q["fp"]), rtol=1e-6
    )


def test_kv_int8_roundtrip():
    rng = np.random.RandomState(3)
    kv = jnp.asarray(rng.randn(3, 2, 1, 8, 16).astype(np.float32))
    q, s = quantize_kv_int8(kv)
    deq = dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(kv)).max()
    assert err <= float(np.asarray(s).max()) * 0.5 + 1e-7


def test_quantized_model_actions_close():
    cfg = tiny_pi0_cfg()
    cfg["action_quantization"] = {
        "mode": "int8",
        "activation_clip": None,
        "cache_fp_weight": False,
    }
    cfg["kv_quantization"] = {"mode": "int8", "activation_clip": 1.0}
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    inputs = tiny_inputs(cfg)

    ref_model = PiZero(tiny_pi0_cfg())
    ref = np.asarray(ref_model.infer_action(params, **inputs))

    qparams = model.enable_action_quantization(params)
    # tied weights stay tied after quantization
    assert qparams["joint"]["proprio"] is qparams["joint"]["action"]
    quant = np.asarray(model.infer_action(qparams, **inputs))
    assert quant.shape == ref.shape
    assert np.isfinite(quant).all()
    # int8 noise amplifies through random-init layers; require the quantized
    # action field to track the fp one closely in aggregate
    corr = np.corrcoef(quant.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(quant - ref).mean() < 0.1


def test_w8a8_mm_close_to_dense():
    from blurr_tpu.ops.quant import quantize_weight_w8a8

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    dense = np.asarray(x @ w)
    quant = np.asarray(mm(x, quantize_weight_w8a8(w)))
    rel = np.abs(quant - dense).max() / np.abs(dense).max()
    assert rel < 0.05  # two int8 quantizations


def test_w8a8_model_actions_track_fp():
    cfg = tiny_pi0_cfg()
    cfg["vlm_quantization"] = {"mode": "w8a8"}
    cfg["action_quantization"] = {"mode": "w8a8"}
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    inputs = tiny_inputs(cfg)

    ref = np.asarray(PiZero(tiny_pi0_cfg()).infer_action(params, **inputs))
    qp = model.enable_action_quantization(params)
    qp = model.enable_vlm_quantization(qp)
    out = np.asarray(model.infer_action(qp, **inputs))
    assert np.isfinite(out).all()
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr
