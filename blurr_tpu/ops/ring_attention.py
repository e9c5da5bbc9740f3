"""Ring attention: sequence-parallel attention with K/V that never gather.

The GSPMD sequence parallelism in the train step (parallel/mesh.py:
sp_constrain) shards tokens but lets XLA all-gather K/V per layer — fine for
Pi-0's 282 tokens, linear-in-S memory. This module is the long-context
complement, new design with no reference counterpart (the reference has no
sequence scaling at all — SURVEY.md §5): K/V blocks stay sharded over the
'seq' mesh axis and rotate device-to-device with ``lax.ppermute`` while each
device folds the visiting block into an online-softmax accumulator
(flash-attention's (m, l, o) recurrence, here across devices instead of SRAM
tiles). Peak per-device attention memory is O(S/n · S/n) for scores and
O(S/n) for K/V — sequence length scales with the mesh, compute overlaps the
ICI transfer of the next block (XLA schedules the ppermute concurrently with
the einsum chain).

Semantics match ops/attention.py:grouped_attention exactly (GQA grouping,
fp32 logits, optional Gemma tanh soft-clamp) and the whole recurrence is a
``lax.scan``, so it differentiates — the backward rides ppermute's transpose
(the reverse rotation), making this a training-capable context-parallel
primitive.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from blurr_tpu.ops.attention import DEFAULT_SOFTCLAMP

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _local_ring(
    q,        # [B, NH, Sq_local, D]
    k,        # [B, KVH, Skv_local, D]
    v,        # [B, KVH, Skv_local, D]
    k_valid,  # bool [B, Skv_local] or None (padding mask, travels with K/V)
    *,
    axis_name: str,
    n_shards: int,
    causal: bool,
    softclamp: Optional[float],
    scale: float,
):
    b, nh, sq, d = q.shape
    kvh = k.shape[1]
    g = nh // kvh
    skv = k.shape[2]
    my = jax.lax.axis_index(axis_name)

    qg = q.reshape(b, kvh, g, sq, d)
    q_pos = my * sq + jnp.arange(sq)  # global query positions

    # each step sends our current block to the PREVIOUS device, so after t
    # rotations device i holds the block that started on shard (i + t) % n
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    synthesized_valid = k_valid is None
    if synthesized_valid:
        k_valid = jnp.ones((b, skv), bool)

    def fold(acc, block, t):
        o, m, l = acc
        k_c, v_c, kval_c = block
        j = (my + t) % n_shards  # original owner of the visiting block
        logits = (
            jnp.einsum("bkgqd,bksd->bkgqs", qg, k_c,
                       preferred_element_type=jnp.float32)
            * scale
        )  # [B, KVH, G, Sq, Skv]
        if softclamp is not None:
            logits = jnp.tanh(logits / softclamp) * softclamp
        keep = kval_c[:, None, None, None, :]
        if causal:
            k_pos = j * skv + jnp.arange(skv)
            keep = keep & (q_pos[:, None] >= k_pos[None, :])[None, None, None]
        logits = jnp.where(keep, logits, _NEG)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(keep, p, 0.0)  # exact zeros for masked slots
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bkgqs,bksd->bkgqd", p, v_c.astype(jnp.float32)
        )
        return (o, m_new, l)

    o0 = jnp.zeros((b, kvh, g, sq, d), jnp.float32)
    m0 = jnp.full((b, kvh, g, sq), _NEG, jnp.float32)
    l0 = jnp.zeros((b, kvh, g, sq), jnp.float32)
    # the scan carry must be marked device-varying over the ring axis
    # (constants are 'unvarying' under shard_map's manual-axes typing, but
    # the fold's outputs vary — pcast/pvary reconciles the carry types)
    if hasattr(jax.lax, "pcast"):
        mark = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    elif hasattr(jax.lax, "pvary"):
        mark = lambda x: jax.lax.pvary(x, (axis_name,))
    else:  # older jax: carries type fine without explicit marking
        mark = lambda x: x
    o0, m0, l0 = (mark(x) for x in (o0, m0, l0))
    if synthesized_valid:  # a passed-in k_valid is already varying
        k_valid = mark(k_valid)

    # fold the resident block first, then rotate-and-fold n-1 times — the
    # final rotation (which would only return blocks to their origin) never
    # happens, saving one full K/V-block ICI transfer per call
    acc = fold((o0, m0, l0), (k, v, k_valid), 0)

    def body(carry, t):
        acc, (k_c, v_c, kval_c) = carry
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kval_c = jax.lax.ppermute(kval_c, axis_name, perm)
        acc = fold(acc, (k_c, v_c, kval_c), t)
        return (acc, (k_c, v_c, kval_c)), None

    (acc, _), _ = jax.lax.scan(
        body, (acc, (k, v, k_valid)), jnp.arange(1, n_shards)
    )
    o, m, l = acc
    out = jnp.where(l[..., None] > 0, o / jnp.maximum(l, 1e-30)[..., None], 0.0)
    return out.reshape(b, nh, sq, d).astype(q.dtype)


def ring_attention(
    q: jax.Array,  # [B, NH, S, D] (global)
    k: jax.Array,  # [B, KVH, S, D]
    v: jax.Array,  # [B, KVH, S, D]
    mesh: Mesh,
    axis_name: str = "seq",
    causal: bool = True,
    k_valid: Optional[jax.Array] = None,  # bool [B, S]
    softclamp: Optional[float] = DEFAULT_SOFTCLAMP,  # same default as
    # grouped_attention (Gemma tanh clamp 50.0); pass None to disable
    scale: Optional[float] = None,
) -> jax.Array:
    """Sequence-parallel GQA attention over ``mesh[axis_name]``; the token
    axis of q/k/v is sharded, K/V blocks rotate via ppermute, output keeps
    the query sharding. Equals ops/attention.py:grouped_attention with a
    causal/padding mask (tests/test_ring_attention.py)."""
    b, nh, s, d = q.shape
    n = mesh.shape[axis_name]
    assert s % n == 0, f"seq {s} must divide the '{axis_name}' axis size {n}"
    assert nh % k.shape[1] == 0, (nh, k.shape[1])
    if scale is None:
        scale = d**-0.5

    spec = P(None, None, axis_name, None)
    vspec = P(None, axis_name)
    fn = partial(
        _local_ring,
        axis_name=axis_name,
        n_shards=n,
        causal=causal,
        softclamp=softclamp,
        scale=scale,
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, None if k_valid is None else vspec),
        out_specs=spec,
    )(q, k, v, k_valid)
