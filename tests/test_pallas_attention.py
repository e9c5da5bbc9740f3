"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from blurr_tpu.ops.attention import grouped_attention
from blurr_tpu.ops.pallas_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("softclamp", [None, 50.0])
@pytest.mark.parametrize(
    "b,nh,kvh,sq,skv,d",
    [
        (1, 4, 1, 64, 64, 32),     # MQA, aligned
        (2, 4, 2, 100, 150, 64),   # GQA, ragged seq
        (1, 8, 1, 277, 277, 256),  # Pi-0 prefill shape
    ],
)
def test_flash_matches_xla(b, nh, kvh, sq, skv, d, softclamp):
    q = _rand((b, nh, sq, d), 0) * 0.3
    k = _rand((b, kvh, skv, d), 1) * 0.3
    v = _rand((b, kvh, skv, d), 2)
    mask = np.random.RandomState(3).rand(b, sq, skv) > 0.3
    mask[:, :, 0] = True
    mask = jnp.asarray(mask)
    ref = grouped_attention(q, k, v, mask, softclamp)
    out = flash_attention(q, k, v, mask, softclamp=softclamp, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_fully_masked_rows_finite():
    q = _rand((1, 2, 16, 32), 0)
    k = _rand((1, 1, 16, 32), 1)
    v = _rand((1, 1, 16, 32), 2)
    mask = jnp.zeros((1, 16, 16), bool)
    out = flash_attention(q, k, v, mask, interpret=True)
    # Fully-masked rows are padding garbage never consumed by the model; the
    # contract is finiteness (the reference's finfo-min trick gives uniform
    # attention, ours gives uniform over the padded block — both finite).
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_int8_matmul_matches_dequant():
    import jax.numpy as jnp

    from blurr_tpu.ops.pallas_int8_matmul import int8_matmul, int8_mm_nd
    from blurr_tpu.ops.quant import quantize_weight_int8

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(37, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96, 130).astype(np.float32))
    q = quantize_weight_int8(w)
    ref = np.asarray(x @ (q["q"].astype(jnp.float32) * q["s"][None, :]))
    out = np.asarray(int8_matmul(x, q["q"], q["s"], interpret=True))
    # bf16 operand rounding on the MXU: ~0.3% of the output scale
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=0.15)

    out_nd = np.asarray(int8_mm_nd(x.reshape(1, 37, 96), q, interpret=True))
    np.testing.assert_allclose(out_nd[0], out, rtol=1e-5, atol=1e-5)
