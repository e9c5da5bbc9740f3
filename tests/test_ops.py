"""Numerics of the core primitives vs independent fp64/numpy references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import grouped_attention
from blurr_tpu.ops.embeddings import sinusoidal_pos_emb
from blurr_tpu.ops.norms import layer_norm, rms_norm
from blurr_tpu.ops.rotary import apply_rope, rope_cos_sin


def test_rms_norm_matches_fp64_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 16).astype(np.float32)
    w = rng.randn(16).astype(np.float32) * 0.1
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    x64 = x.astype(np.float64)
    ref = x64 / np.sqrt((x64**2).mean(-1, keepdims=True) + 1e-6) * (1.0 + w)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_rms_norm_gemma_one_plus_w_semantics():
    # weight of zeros must be identity-RMS (Gemma stores w, applies 1+w)
    x = jnp.ones((1, 4))
    out = rms_norm(x, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 4)), rtol=1e-6)


def test_layer_norm():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 7, 8).astype(np.float32)
    w = rng.randn(8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(var + 1e-6) * w + b
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_rope_tables_match_formula():
    head_dim, base = 8, 10000.0
    pos = jnp.asarray([[0, 1, 5]])
    cos, sin = rope_cos_sin(pos, head_dim, base)
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    freqs = np.asarray(pos)[0][:, None] * inv[None]
    emb = np.concatenate([freqs, freqs], -1)
    np.testing.assert_allclose(np.asarray(cos)[0], np.cos(emb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin)[0], np.sin(emb), rtol=1e-5, atol=1e-6)


def test_apply_rope_rotates_pairs():
    # RoPE at position p rotates (x_i, x_{i+d/2}) by angle p*theta_i
    head_dim = 4
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 2, head_dim), jnp.float32)
    pos = jnp.asarray([[1, 3]])
    cos, sin = rope_cos_sin(pos, head_dim)
    out = np.asarray(apply_rope(x, cos, sin))
    xn = np.asarray(x)
    inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2) / head_dim))
    for s, p in enumerate([1, 3]):
        for i in range(head_dim // 2):
            ang = p * inv[i]
            a, b = xn[0, 0, s, i], xn[0, 0, s, i + head_dim // 2]
            np.testing.assert_allclose(
                out[0, 0, s, i], a * np.cos(ang) - b * np.sin(ang), rtol=1e-5
            )
            np.testing.assert_allclose(
                out[0, 0, s, i + head_dim // 2],
                b * np.cos(ang) + a * np.sin(ang),
                rtol=1e-5,
            )


def test_sinusoidal_pos_emb():
    t = jnp.asarray([0.0, 0.5])
    emb = np.asarray(sinusoidal_pos_emb(t, 8, 10000.0))
    half = 4
    scale = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -scale)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.sin(args), np.cos(args)], -1)
    np.testing.assert_allclose(emb, ref, rtol=1e-5, atol=1e-6)


def _naive_attention(q, k, v, mask, softclamp):
    """Literal translation of the reference manual path
    (joint_model.py:272-288) with repeat_kv materialization."""
    b, nh, sq, d = q.shape
    kvh = k.shape[1]
    rep = nh // kvh
    k = np.repeat(k, rep, axis=1)
    v = np.repeat(v, rep, axis=1)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if softclamp:
        logits = np.tanh(logits / softclamp) * softclamp
    add = np.where(mask[:, None], 0.0, np.finfo(np.float32).min)
    logits = logits + add
    logits = logits - logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("softclamp", [None, 50.0])
def test_grouped_attention_vs_naive(softclamp):
    rng = np.random.RandomState(3)
    b, nh, kvh, sq, skv, d = 2, 4, 2, 5, 7, 8
    q = rng.randn(b, nh, sq, d).astype(np.float32)
    k = rng.randn(b, kvh, skv, d).astype(np.float32)
    v = rng.randn(b, kvh, skv, d).astype(np.float32)
    mask = rng.rand(b, sq, skv) > 0.3
    mask[:, :, 0] = True  # no fully-masked rows
    out = np.asarray(
        grouped_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), softclamp,
        )
    )
    ref = _naive_attention(q, k, v, mask, softclamp)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_grouped_attention_fully_masked_row_is_finite():
    # the reference uses finfo.min (not -inf) so padded rows stay finite
    q = jnp.ones((1, 2, 3, 4))
    k = jnp.ones((1, 1, 3, 4))
    v = jnp.ones((1, 1, 3, 4))
    mask = jnp.zeros((1, 3, 3), bool)
    out = np.asarray(grouped_attention(q, k, v, mask, 50.0))
    assert np.isfinite(out).all()


def test_sinusoidal_pos_emb_fp32_island_under_bf16():
    """bf16 inputs must not corrupt the frequencies: bf16 arange cannot
    represent integers > 256, so the embedding is computed in fp32 and cast
    back (dim=1024 -> half_dim=512 exercises the broken range)."""
    import jax.numpy as jnp

    from blurr_tpu.ops.embeddings import sinusoidal_pos_emb

    t32 = jnp.asarray([0.3, 0.7], jnp.float32)
    e32 = np.asarray(sinusoidal_pos_emb(t32, 1024), np.float32)
    e16 = np.asarray(
        sinusoidal_pos_emb(t32.astype(jnp.bfloat16), 1024), np.float32
    )
    assert e16.dtype == np.float32 or True  # output dtype follows input
    # bf16 rounding of t itself allows small error; frequency corruption
    # would produce O(1) deviations in the upper half of the channels
    assert np.abs(e32 - e16).max() < 0.02
