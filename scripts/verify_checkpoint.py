#!/usr/bin/env python3
"""Validate a reference checkpoint against a config BEFORE running evals.

Loads a Pi-0 ``.pt`` (or PaliGemma safetensors dir, or OpenVLA HF snapshot)
through the bridge, compares every leaf's shape/dtype against the expected
parameter tree for the given config, and reports missing / unexpected /
mismatched entries — so checkpoint problems surface as a readable report
instead of a mid-eval shape error.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = tree
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, required=True,
                   help=".pt file, PaliGemma safetensors dir, or OpenVLA HF dir.")
    p.add_argument("--kind", type=str, default="pi0",
                   choices=["pi0", "paligemma", "openvla"])
    p.add_argument("--config", type=str, default="config/eval/bridge.yaml",
                   help="Config defining the expected shapes (pi0 kind).")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    errors = 0
    if args.kind == "pi0":
        from blurr_tpu.benchmarks import load_cfg
        from blurr_tpu.models.pi0.checkpoint import (
            pizero_params_from_torch_checkpoint,
        )
        from blurr_tpu.models.pi0.pizero import PiZero

        cfg = load_cfg(args.config)
        model = PiZero(cfg)
        expected = flatten(
            jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
        )
        loaded = flatten(
            pizero_params_from_torch_checkpoint(args.checkpoint, dtype=jnp.float32)
        )
    elif args.kind == "paligemma":
        from blurr_tpu.models.paligemma.load import load_hf_model

        model, params = load_hf_model(args.checkpoint, dtype=jnp.float32)
        expected = flatten(
            jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
        )
        loaded = flatten(params)
    else:
        from blurr_tpu.models.openvla.checkpoint import openvla_params_from_hf_dir
        from blurr_tpu.models.openvla.model import OpenVLA, OpenVLASpec

        spec = OpenVLASpec()
        model = OpenVLA(spec)
        expected = flatten(
            jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
        )
        loaded = flatten(
            openvla_params_from_hf_dir(args.checkpoint, spec, jnp.float32)
        )

    missing = sorted(set(expected) - set(loaded))
    unexpected = sorted(set(loaded) - set(expected))
    mismatched = sorted(
        k for k in set(expected) & set(loaded)
        if tuple(expected[k].shape) != tuple(loaded[k].shape)
    )

    print(f"expected leaves: {len(expected)}  loaded leaves: {len(loaded)}")
    for label, items in (
        ("MISSING", missing), ("UNEXPECTED", unexpected), ("SHAPE MISMATCH", mismatched)
    ):
        if items:
            errors += len(items)
            print(f"\n{label} ({len(items)}):")
            for k in items[:40]:
                exp = tuple(expected[k].shape) if k in expected else "-"
                got = tuple(loaded[k].shape) if k in loaded else "-"
                print(f"  {k}: expected {exp}, got {got}")
    if errors == 0:
        print("\nOK: checkpoint matches the config's parameter tree exactly.")
    else:
        print(f"\n{errors} problems found.")
        sys.exit(1)


if __name__ == "__main__":
    main()
