"""Pipeline parallelism over the layer-stacked joint transformer.

The reference is single-GPU (SURVEY.md §2.7) — this is new TPU-native
capability, not a port. The engine already stores every mixture's weights
stacked on a leading ``[L, ...]`` axis and runs them with one
``jax.lax.scan`` (models/pi0/joint.py); that layout makes pipeline
parallelism a *sharding of the L axis*: stage ``s`` of ``S`` holds layers
``[s·L/S, (s+1)·L/S)`` (``PartitionSpec('pipe')`` on dim 0 — the axis the
TP rules never touch), and microbatches rotate stage-to-stage over ICI with
``jax.lax.ppermute`` inside one ``shard_map``. This is the classic SPMD
GPipe schedule: every device runs the same program; at tick ``t`` stage
``s`` works on microbatch ``t − s``, bubbles at the edges are computed but
masked out, and utilization is ``M / (M + S − 1)`` for ``M`` microbatches.

Scope: the *training* forward (``naive_forward`` / ``flow_loss``), where
all mixtures move through all layers each step. Batch-1 inference latency
gains nothing from PP (it adds ICI hops to a weight-bound path) — the
latency tools there are quantization and TP (parallel/mesh.py).

Differentiability: the whole schedule is ``lax.scan`` over ticks +
``ppermute`` (whose transpose is the reverse permute), so ``jax.grad``
through a pipelined loss works; bubble compute receives zero cotangents
and contributes exact zeros (the masked softmax saturates to a uniform
distribution on the all-masked bubble rows — finite, so no NaN·0
contamination).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

# the replication-checking kwarg was renamed check_rep -> check_vma in the
# jax.shard_map move; disable it either way (psum-replicated outputs +
# reverse-mode AD are exactly the patterns the checker historically rejects)
import inspect as _inspect

_SM_PARAMS = _inspect.signature(shard_map).parameters
_SM_NOCHECK = (
    {"check_vma": False}
    if "check_vma" in _SM_PARAMS
    else {"check_rep": False}
    if "check_rep" in _SM_PARAMS
    else {}
)


@dataclass(frozen=True)
class PipelineCtx:
    """How to pipeline a layer scan: the mesh (('pipe',) or ('data','pipe'),
    see make_pipeline_mesh), its pipeline axis name, and the microbatch
    count (None → the largest valid divisor of the batch ≤ the stage count;
    raise M above it to shrink the bubble fraction (S−1)/(M+S−1) at the
    cost of smaller per-microbatch MXU tiles)."""

    mesh: Mesh
    axis: str = "pipe"
    microbatches: Optional[int] = None


def make_pipeline_mesh(stages: int, data: int = 1, devices=None) -> Mesh:
    """A ('pipe',) mesh, or ('data','pipe') when ``data > 1`` — PP composes
    with data parallelism: the microbatch batch dim splits over 'data'
    inside the same shard_map (each data row runs its own pipeline), and
    the gradient psum over 'data' falls out of the shard_map transpose of
    the 'data'-replicated stage weights."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = stages * data
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n])
    if data > 1:
        return Mesh(arr.reshape(data, stages), ("data", "pipe"))
    return Mesh(arr, ("pipe",))


def pipelined_scan(
    layer_fn: Callable[[Any, Any], tuple],
    carry: Any,
    stacked: Any,
    ctx: PipelineCtx,
    consts: Any = None,
) -> Any:
    """Drop-in for ``carry, _ = jax.lax.scan(layer_fn, packet, stacked)``,
    executed as an S-stage pipeline over ``ctx.mesh.shape[ctx.axis]``,
    where ``packet = (carry, consts)`` when ``consts`` is given and just
    ``carry`` otherwise.

    ``consts`` holds per-example layer-INVARIANTS (rope tables, masks, time
    conditioning): ``layer_fn`` must return its consts component unchanged.
    Only ``carry`` rotates stage-to-stage over ICI; each stage reads its
    current microbatch's consts straight from the replicated input buffer
    (index ``t − stage``), so the invariants never pay ppermute/psum
    traffic.

    Requirements (all true for the joint layer body):
      - every leaf of ``carry``/``consts`` has a leading batch axis B;
        `None` entries are fine (empty subtrees);
      - every leaf of ``stacked`` has a leading layer axis L divisible by S;
      - ``layer_fn`` is batch-parallel (no cross-example mixing) and its
        carry output matches the carry input structure/dtypes.

    The microbatch count M defaults to the most microbatches that keep
    >= 8 rows per microbatch per data shard (MXU sublane tile) and >= S —
    large batches get a small bubble fraction (S-1)/(M+S-1) automatically;
    explicit ``ctx.microbatches`` overrides. Returns the final carry for
    the full batch (microbatches reassembled).
    """
    mesh, axis = ctx.mesh, ctx.axis
    num_stages = mesh.shape[axis]
    split = consts is not None

    def as_packet(c, k):
        return (c, k) if split else c

    if num_stages == 1:
        out, _ = jax.lax.scan(layer_fn, as_packet(carry, consts), stacked)
        return out[0] if split else out

    data_size = mesh.shape.get("data", 1)
    batch = jax.tree.leaves(carry)[0].shape[0]
    if ctx.microbatches:
        n_micro = ctx.microbatches
        assert batch % n_micro == 0, (
            f"batch {batch} not divisible by {n_micro} microbatches"
        )
        assert (batch // n_micro) % data_size == 0, (
            f"microbatch rows {batch // n_micro} not divisible by the "
            f"'data' axis ({data_size})"
        )
    else:
        # Default: the most microbatches that still keep >= 8 rows per
        # microbatch per data shard (MXU sublane tile) — large batches get
        # a small bubble fraction (S-1)/(M+S-1) instead of being capped at
        # M = S; small batches fall back to the largest valid divisor <= S.
        min_rows = 8 * data_size
        cap = max(num_stages, batch // min_rows)
        valid = [
            m
            for m in range(min(cap, batch), 0, -1)
            if batch % m == 0 and (batch // m) % data_size == 0
        ]
        assert valid, (
            f"no microbatch count divides batch {batch} with data axis "
            f"{data_size}; pad the batch or set ctx.microbatches"
        )
        n_micro = valid[0]
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    assert n_layers % num_stages == 0, (
        f"{n_layers} layers not divisible by {num_stages} pipeline stages"
    )

    def microify(tree):
        return jax.tree.map(
            lambda x: x.reshape(n_micro, batch // n_micro, *x.shape[1:]), tree
        )

    rotate = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def body(micro_c, micro_k, stacked_local):
        # micro_c/micro_k: [M, B/M, ...] ('data'-split rows); stacked_local:
        # [L/S, ...] — this stage's layers
        stage_idx = jax.lax.axis_index(axis)

        def take(tree, idx):
            return jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, idx, 0, keepdims=False
                ),
                tree,
            )

        def run_stage(c, t):
            # this stage works on microbatch t - stage_idx at tick t; the
            # clamp only engages on bubble ticks, whose outputs are masked
            # out (and re-fed garbage terminates in discarded state, so the
            # backward cotangents through the clamped reads are exact zeros)
            k = take(micro_k, jnp.clip(t - stage_idx, 0, n_micro - 1))
            out, _ = jax.lax.scan(
                layer_fn, as_packet(c, k), stacked_local
            )
            return out[0] if split else out

        state = jax.tree.map(lambda x: jnp.zeros_like(x[0]), micro_c)
        outbuf = jax.tree.map(jnp.zeros_like, micro_c)

        def tick(loop, t):
            state, outbuf = loop
            feed = take(micro_c, jnp.minimum(t, n_micro - 1))
            # stage 0 ingests microbatch t; everyone else continues the
            # carry handed over by the previous stage last tick
            cur = jax.tree.map(
                lambda f, s: jnp.where(stage_idx == 0, f, s), feed, state
            )
            y = run_stage(cur, t)
            # the last stage finishes microbatch t-(S-1) at tick t
            out_idx = jnp.clip(t - (num_stages - 1), 0, n_micro - 1)
            emit = jnp.logical_and(
                stage_idx == num_stages - 1, t >= num_stages - 1
            )
            outbuf = jax.tree.map(
                lambda o, yy: jnp.where(
                    emit,
                    jax.lax.dynamic_update_index_in_dim(o, yy, out_idx, 0),
                    o,
                ),
                outbuf,
                y,
            )
            state = jax.tree.map(
                lambda v: jax.lax.ppermute(v, axis, rotate), y
            )
            return (state, outbuf), None

        (state, outbuf), _ = jax.lax.scan(
            tick, (state, outbuf), jnp.arange(n_micro + num_stages - 1)
        )

        # replicate the finished microbatches from the last stage to all
        # stages (zero elsewhere + psum; bool leaves ride as uint8 — XLA
        # collectives don't add predicates)
        def replicate(o):
            as_bool = o.dtype == jnp.bool_
            x = o.astype(jnp.uint8) if as_bool else o
            x = jnp.where(stage_idx == num_stages - 1, x, jnp.zeros_like(x))
            x = jax.lax.psum(x, axis)
            return x.astype(jnp.bool_) if as_bool else x

        return jax.tree.map(replicate, outbuf)

    specs = _axis_only_specs(mesh, axis)
    result = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs.packet, specs.packet, specs.staged),
        out_specs=specs.packet,
        **_SM_NOCHECK,
    )(microify(carry), microify(consts), stacked)
    return jax.tree.map(
        lambda x: x.reshape(batch, *x.shape[2:]), result
    )


@dataclass(frozen=True)
class _Specs:
    packet: P  # microbatched packet: replicated over 'pipe', rows over 'data'
    staged: P  # stacked layer weights: leading L axis over 'pipe'


def shard_params_pipeline(params, mesh: Mesh, axis: str = "pipe"):
    """device_put a Pi-0 parameter tree for pipeline execution: every
    layer-stacked joint leaf (everything under ``joint/<mixture>`` except
    ``final_norm``) is split on its leading L axis over ``axis`` — stage s
    stores only its own layers — and everything else (vision tower,
    projector, encoders/decoders, final norms) is replicated. Preserves
    leaf aliasing the same way mesh.shard_params does (tied trees)."""
    from jax.sharding import NamedSharding

    n_stages = mesh.shape[axis]

    def spec_for(path: str, leaf) -> P:
        parts = path.split("/")
        if "joint" in parts and "final_norm" not in parts:
            n_layers = leaf.shape[0]
            assert n_layers % n_stages == 0, (
                f"{path}: {n_layers} layers not divisible by {n_stages} "
                "pipeline stages"
            )
            return P(axis)
        return P()

    cache = {}

    def walk(tree, path):
        if tree is None:
            return None
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        sharding = NamedSharding(mesh, spec_for(path, tree))
        key = (id(tree), sharding)
        if key not in cache:
            cache[key] = jax.device_put(tree, sharding)
        return cache[key]

    return walk(params, "")


def _axis_only_specs(mesh: Mesh, axis: str) -> _Specs:
    # ('pipe',): packets replicated, stacked weights split on L.
    # ('data','pipe'): additionally split the microbatch row dim over
    # 'data' — each data row runs its own pipeline; the stage weights are
    # 'data'-replicated, so their shard_map transpose psums the grads.
    if mesh.axis_names == (axis,):
        return _Specs(packet=P(), staged=P(axis))
    assert mesh.axis_names == ("data", axis), (
        f"pipelined_scan expects a ('{axis}',) or ('data', '{axis}') mesh, "
        f"got {mesh.axis_names}; build one with make_pipeline_mesh(stages, "
        "data)"
    )
    return _Specs(packet=P(None, "data"), staged=P(axis))
