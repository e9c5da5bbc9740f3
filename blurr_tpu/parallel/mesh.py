"""Device-mesh parallelism for the VLA stack.

The reference is single-GPU only (SURVEY.md §2.7: a vestigial DDP shim and
nothing else), so this module is new design, not port: a
``jax.sharding.Mesh`` over ICI with ('data', 'model') axes, NamedSharding
rules for tensor parallelism over attention heads / MLP intermediate, and
GSPMD (jit + sharding annotations) inserting the collectives.

Default deployment is a 1x1 mesh — Pi-0 (3B) fits one v5e chip — with TP as
the capability extension for larger models (e.g. OpenVLA-7B on small chips)
and DP for throughput benchmarking.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def make_mesh(
    data: int = 1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


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


def _spec_for_path(path: str, leaf) -> P:
    rules = _mixture_rules()
    parts = path.split("/")
    name = parts[-1]
    if name in _QUANT_LEAF_KEYS and len(parts) >= 2:
        parent = _spec_for_path("/".join(parts[:-1]), leaf)
        if name in ("q", "q8a", "fp"):
            return parent  # same shape/layout as the fp weight
        if name == "s":
            # per-output-channel scale: the weight minus its contracted
            # (-2) axis, so drop that entry from the parent spec
            if len(parent) >= 2:
                return P(*parent[:-2], parent[-1])
            return P()
        return P()  # q4 block-major packing is not TP-sharded (see server)
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


def pi0_param_sharding(params, mesh: Mesh):
    """NamedSharding tree for a Pi-0 parameter pytree."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        return NamedSharding(mesh, _spec_for_path(path, tree))

    return walk(params, "")


def shard_params(params, mesh: Mesh):
    shardings = pi0_param_sharding(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
