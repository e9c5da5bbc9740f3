"""Pallas fused W4A8 matmul: int4 nibble-packed weights, int8 MXU.

Motivation (measured, experiments/bench_pallas_int4*.py, v5e):
- XLA cannot consume int4 weights: an in-graph nibble unpack never fuses
  into the dot (w4a8 28.4 ms vs w8a8 3.3 ms on an 18-layer Gemma-MLP chain),
  and native S4 arrays cannot even cross a jit boundary on the axon backend
  (device_put relayout recurses).
- Inside a Pallas kernel, `pltpu.bitcast(packed_int8, jnp.int4)` followed by
  `.astype(jnp.int8)` IS lowered natively by Mosaic: the unpack is ~free and
  the kernel streams half the HBM bytes of the int8 path.
- At the Llama-7B decode GEMV shape (M=8, K=4096, N=11264) the kernel runs
  43.9 us/layer vs 63.9-74.5 us for the XLA int8 dot — ~1.7x faster AND half
  the weight memory. Two scheduler details are load-bearing: a
  `pl.CostEstimate` (without it the pipeline under-buffers) and BLOCK-MAJOR
  weight storage (see to_block_major — strided row-major blocks stream at
  only ~300 GB/s).

Packing layout: adjacent-row nibble pairs — byte[k, n] holds row 2k in the
low nibble and row 2k+1 in the high nibble, matching the TPU's native S4
lane order (bitcast round-trips exactly; max err 0 vs an int32 reference) —
then block-major over N: [NB, K//2, BN] so each grid step's DMA is one
contiguous chunk.

Accuracy: group-wise symmetric int4 (512-row groups by default,
GPTQ-style round-to-nearest — the kernel accumulates per-group int32 dots
scaled by per-group fp32 scales). Still an opt-in tier like w8a8 —
validate task success with real checkpoints before production use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from blurr_tpu.ops.pallas_common import round_up as _round_up
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bn=1408 (11 lanes of 128) measured fastest at decode shapes; smaller
# blocks are chosen when they waste less padding (pick_block_layout). bm
# caps the token-block size.
_BLOCK_M = 256



def pick_block_layout(n: int, shards: int = 1) -> tuple:
    """(block_n, padded_n): the largest block whose zero padding stays under
    5% — big contiguous DMAs beat minimal padding (bn=1408 measured fastest
    at the decode GEMV shape; e.g. Llama's N=11008 pads 2.3% to 11264 rather
    than dropping to unmeasured 256-wide blocks). Falls back to the
    minimum-padding block for small/awkward widths.

    ``shards > 1`` (tensor-parallel packing): the padded width is
    additionally a multiple of ``block_n * shards``, so the block axis NB
    divides evenly over the 'model' mesh axis and every shard's blocks
    cover one contiguous column range (padding confined to the tail
    shard). GSPMD shards the packed weight on NB and the padded scales on
    N with no repartitioning inside the kernel."""
    assert shards >= 1, shards
    candidates = [
        (bn, _round_up(n, bn * shards)) for bn in (1408, 1024, 512, 256, 128)
    ]
    for bn, n_pad in candidates:
        if n_pad <= n * 1.05:
            return bn, n_pad
    return min(candidates, key=lambda c: (c[1], -c[0]))


def pack_int4(q: jax.Array) -> jax.Array:
    """int8 [..., K, N] with values in [-8, 7] -> packed int8 [..., K//2, N].

    Adjacent-row pairs: even row -> low nibble, odd row -> high nibble (the
    order pltpu.bitcast(int8, int4) expands to on TPU).
    """
    assert q.shape[-2] % 2 == 0, q.shape
    lo = q[..., 0::2, :] & 0x0F
    hi = (q[..., 1::2, :] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def to_block_major(packed: jax.Array, block_n: int) -> jax.Array:
    """packed [..., K//2, N] -> block-major [..., N//block_n, K//2, block_n].

    Each weight block the kernel consumes becomes one fully CONTIGUOUS HBM
    chunk. This is load-bearing: with row-major storage each [K//2, bn]
    block is a strided read (bn-byte bursts) and the kernel streams at only
    ~300 GB/s; block-major reaches ~525 GB/s at the decode GEMV shape —
    1.7x faster than the XLA int8 dot on half the bytes
    (experiments/bench_pallas_int4_tune6.py).
    """
    *lead, k2, n = packed.shape
    assert n % block_n == 0, (n, block_n)
    nb = n // block_n
    reshaped = packed.reshape(*lead, k2, nb, block_n)
    return jnp.moveaxis(reshaped, -2, -3)


def pick_group_size(k: int, preferred: int = 512) -> int:
    """Largest divisor of k among (preferred, 256, 128); whole-K (i.e.
    plain per-out-channel scaling) if none divides."""
    for g in (preferred, 256, 128):
        if k % g == 0 and k >= g:
            return g
    return k


def _kernel(x_ref, p_ref, s_ref, o_ref, *, groups):
    w = pltpu.bitcast(p_ref[0], jnp.int4).astype(jnp.int8)  # [K, BN]
    rows = w.shape[0] // groups
    acc = None
    for g in range(groups):  # static unroll: per-group int32 dot x fp32 scale
        d = jnp.dot(
            x_ref[:, g * rows : (g + 1) * rows],
            w[g * rows : (g + 1) * rows],
            preferred_element_type=jnp.int32,
        )
        term = d.astype(jnp.float32) * s_ref[g]
        acc = term if acc is None else acc + term
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def int4_matmul(
    x: jax.Array,  # [M, K] int8 (quantized activations)
    packed: jax.Array,  # [NB, K//2, BN] int8 (block-major nibble-packed int4)
    scale: jax.Array,  # [G, NB*BN] fp32 weight scales: G groups over K (padded N)
    block_m: int = _BLOCK_M,
    interpret: bool = False,
) -> jax.Array:
    """Returns fp32 [M, NB*BN] = sum_g (x_g @ unpack(packed)_g) * scale[g].

    G=1 is plain per-out-channel scaling; G>1 is group-wise (GPTQ-style RTN
    groups over the K dimension — the accuracy-credible int4 recipe). The
    per-token activation scale is applied by the caller (w4a8_mm) so XLA can
    fuse it with the surrounding graph.
    """
    m, k = x.shape
    nb, k2, bn = packed.shape
    groups, n = scale.shape
    assert k == 2 * k2 and n == nb * bn and k % groups == 0, (
        x.shape, packed.shape, scale.shape)
    # single m-block up to 512 rows (avoids padding 279-token prefills to a
    # 256 multiple); block_m-sized grid above that
    bm = _round_up(m, 8) if m <= 512 else block_m
    m_p = _round_up(m, bm)
    if m_p != m:
        x = jnp.pad(x, ((0, m_p - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups),
        grid=(m_p // bm, nb),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2, bn), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * k * n,
            bytes_accessed=k2 * n + m_p * k + m_p * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, packed, scale.astype(jnp.float32))
    return out[:m] if m_p != m else out


def unpack_int4_reference(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 in plain XLA: packed int8 [..., K//2, N] ->
    int8 [..., K, N]. Row-interleaves the sign-extended nibbles. Slow on TPU
    (the unpack materializes through HBM) — used on CPU and in tests."""
    p = packed.astype(jnp.int32)
    lo = (((p & 0x0F) ^ 0x08) - 0x08).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., K//2, 2, N]
    shape = packed.shape[:-2] + (packed.shape[-2] * 2, packed.shape[-1])
    return stacked.reshape(shape)  # rows interleave as (lo_0, hi_0, lo_1, ...)


def from_block_major(packed_bm: jax.Array) -> jax.Array:
    """Inverse of to_block_major: [..., NB, K//2, BN] -> [..., K//2, NB*BN]."""
    *lead, nb, k2, bn = packed_bm.shape
    return jnp.moveaxis(packed_bm, -3, -2).reshape(*lead, k2, nb * bn)


# ---------------------------------------------------------------------------
# GSPMD partitioning: tensor-parallel int4 matmul
# ---------------------------------------------------------------------------
# pallas_call is an opaque custom call to the SPMD partitioner, so a
# TP-sharded w4a8 weight needs an explicit rule. The block-major layout
# makes column sharding natural: splitting the NB axis over 'model' hands
# each chip whole contiguous blocks (its own contiguous column range of the
# padded width), and the padded scales split identically on N — each chip
# runs the UNCHANGED kernel on its local [NB/t, K//2, BN] slice. x stays
# whole (its leading sharding, e.g. dp over the batch, is preserved).


def _int4_spmd_rules(interpret: bool):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _axes(arg_shapes):
        xspec = arg_shapes[0].sharding.spec
        pspec = arg_shapes[1].sharding.spec
        m_axis = xspec[0] if len(xspec) else None
        nb_axis = pspec[0] if len(pspec) else None
        return m_axis, nb_axis

    def infer_sharding(mesh, arg_shapes, result_shape):
        m_axis, nb_axis = _axes(arg_shapes)
        return NamedSharding(mesh, P(m_axis, nb_axis))

    def partition(mesh, arg_shapes, result_shape):
        m_axis, nb_axis = _axes(arg_shapes)
        arg_shardings = (
            NamedSharding(mesh, P(m_axis, None)),
            NamedSharding(mesh, P(nb_axis, None, None)),
            NamedSharding(mesh, P(None, nb_axis)),
        )
        out_sharding = NamedSharding(mesh, P(m_axis, nb_axis))

        def lower(x, packed, scale):
            return int4_matmul(x, packed, scale, interpret=interpret)

        return mesh, lower, out_sharding, arg_shardings

    return infer_sharding, partition


@functools.lru_cache(maxsize=2)
def _int4_matmul_spmd(interpret: bool = False):
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def spmd(x, packed, scale):
        return int4_matmul(x, packed, scale, interpret=interpret)

    infer_sharding, partition = _int4_spmd_rules(interpret)
    spmd.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        # Shardy factor rule: NB is shared between the packed weight, the
        # padded scales' compound N = (NB BN), and the output columns —
        # sharding any of them along 'model' propagates to the others.
        sharding_rule="m k, nb hk bn, g (nb bn) -> m (nb bn)",
    )
    return spmd


def int4_matmul_spmd(
    x: jax.Array, packed: jax.Array, scale: jax.Array, interpret: bool = False
) -> jax.Array:
    """``int4_matmul`` wrapped for GSPMD: under a mesh with the packed
    weight sharded on its NB axis (parallel/mesh.py's rule for TP-packed
    w4a8 dicts), each device runs the kernel on its own column blocks;
    replicated operands lower exactly like the raw kernel. Requires the
    weight packed with ``pick_block_layout(n, shards=tp)`` so NB divides
    the 'model' axis (ops/quant.py:repack_w4a8)."""
    return _int4_matmul_spmd(interpret)(x, packed, scale)
