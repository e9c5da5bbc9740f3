"""Ring attention (ops/ring_attention.py) vs the plain XLA attention.

The ring recurrence (online-softmax accumulation over ppermute-rotated K/V
blocks) is a layout/memory transform, never math: outputs and gradients must
match ops/attention.py:grouped_attention bit-for-tolerance on every mask
configuration, shard count, and GQA grouping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.ops.attention import grouped_attention
from blurr_tpu.ops.ring_attention import ring_attention
from blurr_tpu.parallel.mesh import make_mesh


def _qkv(b=2, nh=4, kvh=1, s=16, d=8, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, nh, s, d), dtype)
    k = jnp.asarray(rng.randn(b, kvh, s, d), dtype)
    v = jnp.asarray(rng.randn(b, kvh, s, d), dtype)
    return q, k, v


def _causal_mask(b, s):
    return jnp.broadcast_to(
        jnp.tril(jnp.ones((s, s), bool))[None], (b, s, s)
    )


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_plain(n_shards, causal):
    q, k, v = _qkv()
    b, _, s, _ = q.shape
    mask = _causal_mask(b, s) if causal else None
    ref = grouped_attention(q, k, v, mask=mask, softclamp=None)
    mesh = make_mesh(seq=n_shards)
    out = ring_attention(q, k, v, mesh, causal=causal, softclamp=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_gqa_and_softclamp():
    """8 Q heads over 2 KV heads with the Gemma tanh soft-clamp."""
    q, k, v = _qkv(nh=8, kvh=2, s=12, seed=1)
    mesh = make_mesh(seq=4)
    ref = grouped_attention(
        q, k, v, mask=_causal_mask(q.shape[0], q.shape[2]), softclamp=50.0
    )
    out = ring_attention(q, k, v, mesh, causal=True, softclamp=50.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_padding_mask():
    """k_valid travels with its K/V block through the rotation; padded slots
    contribute exact zeros, and a fully-masked query row returns 0 (the
    plain path's softmax would emit uniform garbage there, so compare only
    valid rows)."""
    q, k, v = _qkv(s=16, seed=2)
    b, _, s, _ = q.shape
    k_valid = jnp.asarray(
        np.repeat(np.arange(s)[None] < np.array([[13], [9]]), 1, 0).reshape(b, s)
    )
    mask = _causal_mask(b, s) & k_valid[:, None, :]
    ref = grouped_attention(q, k, v, mask=mask, softclamp=None)
    mesh = make_mesh(seq=4)
    out = ring_attention(q, k, v, mesh, causal=True, k_valid=k_valid,
                         softclamp=None)
    valid_rows = np.asarray(mask.any(-1))  # [B, Sq]
    np.testing.assert_allclose(
        np.asarray(out)[valid_rows[:, None, :].repeat(q.shape[1], 1)],
        np.asarray(ref)[valid_rows[:, None, :].repeat(q.shape[1], 1)],
        rtol=1e-5, atol=1e-6,
    )


def test_ring_gradients_match():
    """The scan+ppermute recurrence differentiates: grads wrt q, k, v equal
    the plain attention's (context-parallel TRAINING capability)."""
    q, k, v = _qkv(s=8, seed=3)
    b, _, s, _ = q.shape
    mask = _causal_mask(b, s)
    mesh = make_mesh(seq=2)

    def loss_ref(q, k, v):
        return (grouped_attention(q, k, v, mask=mask, softclamp=None) ** 2).sum()

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh, causal=True,
                               softclamp=None) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_ring_bf16_long_sequence():
    """bf16 inputs, fp32 accumulators: a 128-token sequence over 8 shards
    stays within bf16 round-off of the plain fp32-logit path."""
    q, k, v = _qkv(s=128, seed=4, dtype=jnp.bfloat16)
    mesh = make_mesh(seq=8)
    ref = grouped_attention(
        q, k, v, mask=_causal_mask(q.shape[0], q.shape[2]), softclamp=None
    )
    out = ring_attention(q, k, v, mesh, causal=True, softclamp=None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_ring_default_softclamp_matches_grouped_default():
    """Both APIs default to the Gemma tanh soft-clamp (50.0), so a drop-in
    swap keeps reference semantics."""
    q, k, v = _qkv(s=8, seed=5)
    mesh = make_mesh(seq=2)
    ref = grouped_attention(q, k, v, mask=None)  # default softclamp
    out = ring_attention(q, k, v, mesh, causal=False)  # default softclamp
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
