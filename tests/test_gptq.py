"""GPTQ calibration-based w4a8 rounding (ops/gptq.py).

The w4a8 accuracy upgrade (round-4 verdict Next #4): error-feedback
rounding against a calibration Hessian, emitting the SAME {"q4", "s"}
format as the data-free path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.ops.gptq import (
    gptq_quantize_weight,
    hessian_from_inputs,
    layer_output_mse,
)
from blurr_tpu.ops.quant import _w4a8_deq, quantize_weight_w4a8, w4a8_mm


def _correlated_inputs(rng, t, k, rank=8, basis=None):
    """Low-rank-dominated activations: the regime where error feedback
    beats per-cell rounding (errors can be compensated along the
    directions the data actually exercises). Pass ``basis`` to draw a
    held-out batch from the SAME distribution (fresh coefficients/noise);
    a fresh basis is a different distribution entirely — GPTQ optimizes
    the layer output for the directions the calibration data spans."""
    if basis is None:
        basis = rng.randn(rank, k).astype(np.float32)
    coef = rng.randn(t, rank).astype(np.float32)
    x = coef @ basis + 0.05 * rng.randn(t, k).astype(np.float32)
    return jnp.asarray(x), basis


def test_identity_hessian_degenerates_to_rtn():
    """With H = (damped) identity there is nothing to feed back, so GPTQ
    must reproduce the data-free MSE-clip path bit-for-bit — same packed
    bytes, same scales."""
    rng = np.random.RandomState(0)
    k, n = 256, 192
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    h = jnp.eye(k, dtype=jnp.float32)
    got = gptq_quantize_weight(w, h, group_size=128)
    want = quantize_weight_w4a8(w, group_size=128)
    np.testing.assert_array_equal(np.asarray(got["q4"]), np.asarray(want["q4"]))
    np.testing.assert_allclose(np.asarray(got["s"]), np.asarray(want["s"]),
                               rtol=1e-6)


def test_gptq_beats_rtn_on_correlated_data():
    """On correlated calibration activations, GPTQ's layer-output error
    ||X(W - Wq)||^2 must come in strictly below data-free rounding — on
    the calibration batch AND on a held-out batch from the same
    distribution."""
    rng = np.random.RandomState(1)
    k, n = 256, 192
    w = jnp.asarray(0.1 * rng.randn(k, n).astype(np.float32))
    x_cal, basis = _correlated_inputs(rng, 512, k)
    x_test, _ = _correlated_inputs(rng, 512, k, basis=basis)
    h = hessian_from_inputs(x_cal)
    q_gptq = gptq_quantize_weight(w, h, group_size=128)
    q_rtn = quantize_weight_w4a8(w, group_size=128)
    for x in (x_cal, x_test):
        e_gptq = float(layer_output_mse(x, w, q_gptq))
        e_rtn = float(layer_output_mse(x, w, q_rtn))
        assert e_gptq < e_rtn, (e_gptq, e_rtn)
    # and the improvement is substantial on the calibration set, not noise
    assert float(layer_output_mse(x_cal, w, q_gptq)) < 0.8 * float(
        layer_output_mse(x_cal, w, q_rtn)
    )


def test_gptq_output_feeds_the_w4a8_path():
    """The GPTQ dict is a drop-in w4a8 weight: w4a8_mm consumes it and the
    result matches the dequantized reference matmul."""
    rng = np.random.RandomState(2)
    k, n = 128, 160
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    x = jnp.asarray(rng.randn(4, k).astype(np.float32))
    q = gptq_quantize_weight(w, hessian_from_inputs(x), group_size=128)
    assert set(q) == {"q4", "s"}
    y = w4a8_mm(x, q)
    deq = _w4a8_deq(q["q4"], q["s"], k)
    xs = jnp.clip(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -128, 127)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray((xq @ deq) * xs), rtol=1e-5, atol=1e-5
    )


def test_hessian_handles_dead_inputs():
    """Zero calibration columns (never-active inputs) must not break the
    Cholesky; their rows quantize without feedback."""
    rng = np.random.RandomState(3)
    k, n = 128, 64
    x = np.array(_correlated_inputs(rng, 64, k)[0])
    x[:, 7] = 0.0
    h = hessian_from_inputs(jnp.asarray(x))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))
    q = gptq_quantize_weight(w, h, group_size=128)
    assert np.isfinite(np.asarray(q["s"])).all()
    assert np.isfinite(np.asarray(_w4a8_deq(q["q4"], q["s"], k))).all()
