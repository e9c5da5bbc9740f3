"""Device-mesh parallelism for the VLA stack.

The reference is single-GPU only (SURVEY.md §2.7: a vestigial DDP shim and
nothing else), so this module is new design, not port: a
``jax.sharding.Mesh`` over ICI with ('data', 'model') axes, NamedSharding
rules for tensor parallelism over attention heads / MLP intermediate, and
GSPMD (jit + sharding annotations) inserting the collectives.

Default deployment is a 1x1 mesh — Pi-0 (3B) fits one v5e chip — with TP as
the capability extension for larger models (e.g. OpenVLA-7B on small chips),
DP for throughput, and FSDP (``shard_params(..., fsdp=True)``) sharding
weights + adamw moments over the 'data' axis for training states larger
than one chip's HBM (ZeRO-3 semantics; GSPMD inserts the per-use weight
all-gathers and grad reduce-scatters).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'seq', 'model') mesh. 'seq' is the sequence-parallel axis:
    activations shard over their token dimension (P(None, 'seq', None)
    constraints in the forward, see models/pi0/joint.py:naive_forward) while
    weights stay governed by the 'model'/'data' rules — GSPMD inserts the
    per-layer K/V all-gathers that sequence-sharded attention needs. Axes of
    size 1 are free, so existing ('data','model') callers are unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    n = data * seq * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, seq, model)
    return Mesh(arr, ("data", "seq", "model"))


def sp_constrain(x, sp_axis: Optional[str]):
    """Sequence-parallel sharding constraint for a [B, S, ...] activation:
    shard the token axis over ``sp_axis`` (mesh axis name, normally 'seq')
    and leave every other dimension to GSPMD propagation. A None axis is a
    no-op so single-device callers pay nothing. Must be traced under the
    target Mesh (the train step runs inside ``with mesh:``)."""
    if sp_axis is None:
        return x
    spec = P(*([None, sp_axis] + [None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host TPU pod slice via ``jax.distributed.initialize``.

    On Cloud TPU VMs all arguments are auto-discovered from the metadata
    server (pass None); elsewhere supply them explicitly. After this,
    ``jax.devices()`` spans the pod and ``make_mesh`` lays the mesh over
    ICI within hosts and DCN across them (keep the 'model' axis within a
    host: GSPMD routes TP collectives over ICI, DP grad psum over DCN).
    Returns the process index. Single-process (n=1) is a no-op.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as exc:
            # a genuine pod-join failure must be visible: silently degrading
            # would run N independent single-host trainings all writing the
            # same save dir
            log.warning(
                "jax.distributed.initialize() auto-discovery failed (%s); "
                "continuing single-process (process_count=%d). If this host "
                "is part of a pod slice, pass coordinator_address/"
                "num_processes/process_id explicitly.",
                exc,
                jax.process_count(),
            )
            return 0  # single-process / non-pod environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def _mixture_rules() -> Dict[str, P]:
    """TP layout for one Gemma-format mixture: shard attention Q heads and
    the MLP intermediate over 'model'. K/V projections stay replicated — the
    Gemma joint model is MQA (1 KV head), so the KV tensors are tiny and
    replicating them avoids sharding the head_dim (which would split RoPE
    pairs). Layer-stacked arrays carry a leading L axis (never sharded)."""
    return {
        "q_w": P(None, None, "model"),  # [L, H, NH*D] -> split heads
        "k_w": P(None, None, None),
        "v_w": P(None, None, None),
        "o_w": P(None, "model", None),  # [L, NH*D, H] -> split input
        "gate_w": P(None, None, "model"),  # [L, H, I]
        "up_w": P(None, None, "model"),
        "down_w": P(None, "model", None),  # [L, I, H]
    }


# leaf keys of the quantized-weight dicts (ops/quant.py): the dict REPLACES
# the weight leaf, so the TP rule lives one path level up
_QUANT_LEAF_KEYS = frozenset({"q", "q8a", "q4", "s", "fp"})

# leaf keys of the LoRA adapter dicts (ops/lora.py:inject_lora_tree); like
# the quant dicts they replace the weight leaf, so the base "w" inherits the
# parent's TP rule, lora_a [.., in, r] keeps the in-dim axis (row-parallel
# parents), lora_b [.., r, out] the out-dim axis (column-parallel parents) —
# then y = x@W + (x@A)@B needs exactly the collectives W already needed.
_LORA_LEAF_KEYS = frozenset({"w", "lora_a", "lora_b", "lora_s"})


def _spec_for_path(path: str, leaf) -> P:
    rules = _mixture_rules()
    parts = path.split("/")
    name = parts[-1]
    if name in _LORA_LEAF_KEYS and len(parts) >= 2:
        parent = _spec_for_path("/".join(parts[:-1]), leaf)
        if name == "w":
            return parent
        if name == "lora_s" or len(parent) < 2:
            return P()  # scales / replicated parents
        entries = list(parent)
        if name == "lora_a":
            return P(*entries[:-1], None)
        return P(*entries[:-2], None, entries[-1])  # lora_b
    if name in _QUANT_LEAF_KEYS and len(parts) >= 2:
        parent = _spec_for_path("/".join(parts[:-1]), leaf)
        tp_parent = any(e == "model" for e in parent)
        if name in ("q", "q8a", "fp"):
            return parent  # same shape/layout as the fp weight
        if name == "q4":
            # block-major packed int4 [..., NB, K//2, BN]: COLUMN-parallel
            # on the NB block axis whenever the parent weight is TP-sharded
            # at all (row-parallel parents too — sharding the contraction
            # dim would split a group's int32 accumulation across chips;
            # column-sharding keeps the Pallas kernel unchanged per shard
            # and at decode batch sizes the extra activation all-gather is
            # KB-scale while the weight streaming, the int4 point, scales
            # 1/t). shard_params repacks the layout so NB divides 'model'
            # (ops/quant.py:repack_w4a8); the kernel's GSPMD rule is
            # ops/pallas_int4_matmul.py:int4_matmul_spmd.
            if tp_parent:
                nd = getattr(leaf, "ndim", 3)
                return P(*([None] * (nd - 3) + ["model", None, None]))
            return P()
        if name == "s":
            # int8/w8a8 scales are per-output-channel: the weight minus its
            # contracted (-2) axis, identified by ndim == weight_ndim - 1.
            # w4a8 scales are GROUP-wise [..., G, N] (same ndim as the
            # weight) — their exact-N axis splits alongside the q4 blocks.
            nd = getattr(leaf, "ndim", None)
            if nd == len(parent) and tp_parent:  # w4a8 group scales
                return P(*([None] * (nd - 1) + ["model"]))
            if len(parent) >= 2 and nd == len(parent) - 1:
                return P(*parent[:-2], parent[-1])
            return P()
        return P()
    if ("joint" in parts or "llama" in parts) and name in rules:
        # Gemma mixtures are MQA (KV replicated); Llama-2 is MHA, where the
        # 32 KV heads shard cleanly alongside Q
        if "llama" in parts and name in ("k_w", "v_w"):
            return P(None, None, "model")
        return rules[name]
    if "llama" in parts and name == "lm_head":
        return P(None, "model")  # split vocab logits
    if name == "embed_tokens":
        return P("model", None)  # shard vocab
    if "siglip" in parts and "layers" in parts:
        if name in ("q_w", "k_w", "v_w"):
            return P(None, None, "model")
        if name == "out_w":
            return P(None, "model", None)
        if name == "fc1_w":
            return P(None, None, "model")
        if name == "fc2_w":
            return P(None, "model", None)
    return P()  # replicate


def _augment_fsdp(spec: P, shape, data_size: int) -> P:
    """ZeRO-3 / GSPMD-FSDP: put the 'data' mesh axis (the one the batch is
    split over) on the largest axis of the weight that the TP spec leaves
    free and that divides evenly. XLA then stores 1/data of every weight
    (and, downstream, of every adamw moment — opt_state inherits the params'
    shardings) per device, all-gathers weights at each use, and
    reduce-scatters the grads — no hand-written collectives.

    Leaves with no divisible free axis (tiny scalars, odd dims) stay as the
    TP spec says; they are a negligible fraction of the 3B tree."""
    if data_size <= 1 or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, (e, dim) in enumerate(zip(entries, shape)):
        if e is None and dim >= data_size and dim % data_size == 0:
            if best is None or dim > shape[best]:
                best = i
    if best is None:
        return spec
    entries[best] = "data"
    return P(*entries)


def pi0_param_sharding(params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding tree for a Pi-0 parameter pytree. ``fsdp`` additionally
    shards every leaf over the 'data' axis (see _augment_fsdp) — the training
    configuration for models/optimizer states larger than one chip's HBM."""
    data_size = mesh.shape.get("data", 1)

    def walk(tree, path):
        if tree is None:  # canonical tied form: empty subtree, no sharding
            return None
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        spec = _spec_for_path(path, tree)
        if fsdp:
            spec = _augment_fsdp(spec, getattr(tree, "shape", ()), data_size)
        return NamedSharding(mesh, spec)

    return walk(params, "")


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """device_put the tree with its NamedShardings, PRESERVING leaf aliasing:
    tie_action_proprio_weights points the proprio mixture at the action
    arrays, and the trainable masks (models/pi0/trainable.py) detect that tie
    by identity — a plain tree.map(device_put) would silently break it (and
    duplicate the tied weights' HBM). Leaves that are the same array object
    map to the same sharded array."""
    if mesh.shape.get("model", 1) > 1:
        # TP: losslessly re-lay any w4a8 packing whose block axis does not
        # divide the 'model' axis (identity-preserving walk — no-op for
        # trees without int4 weights or already-divisible layouts)
        from blurr_tpu.ops.quant import repack_w4a8_tree

        params = repack_w4a8_tree(params, mesh.shape["model"])
    shardings = pi0_param_sharding(params, mesh, fsdp=fsdp)
    cache: Dict = {}

    def put(x, s):
        key = (id(x), s)
        if key not in cache:
            cache[key] = jax.device_put(x, s)
        return cache[key]

    return jax.tree.map(put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
