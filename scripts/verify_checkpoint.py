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
    p.add_argument("--parity", action="store_true",
                   help="pi0 kind: ALSO load the checkpoint into the "
                        "reference's torch PiZero (CPU, from /root/reference)"
                        " and compare integrated actions against the bridged "
                        "JAX forward on a shared input — one-command "
                        "numerical parity for a real checkpoint.")
    p.add_argument("--parity-tol", type=float, default=1e-2,
                   help="Max |action| deviation tolerated by --parity.")
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

    if args.parity:
        if args.kind != "pi0":
            print("--parity currently supports kind=pi0 only.")
            sys.exit(2)
        dev = run_pi0_parity(args.checkpoint, args.config)
        print(f"\nParity: max action deviation torch-vs-jax = {dev:.2e} "
              f"(tol {args.parity_tol:.0e})")
        if dev > args.parity_tol:
            print("PARITY FAILED")
            sys.exit(1)
        print("PARITY OK")


def run_pi0_parity(checkpoint: str, config: str) -> float:
    """Load ``checkpoint`` into BOTH stacks — the reference's torch PiZero
    (its own vendored modules, fp32 CPU) and the bridged JAX PiZero — drive
    one ``infer_action`` with identical inputs/noise, and return the max
    absolute action deviation."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from blurr_tpu.benchmarks import load_cfg
    from blurr_tpu.models.pi0.checkpoint import (
        load_torch_state_dict,
        pizero_params_from_torch_checkpoint,
    )
    from blurr_tpu.models.pi0.pizero import PiZero
    from blurr_tpu.utils.reference_bridge import (
        build_ref_pizero,
        load_reference,
        reference_available,
        t2n,
    )

    if not reference_available():
        print("reference tree not available; cannot run --parity.")
        sys.exit(2)
    ref = load_reference()
    torch = ref.torch
    torch.set_grad_enabled(False)

    cfg = load_cfg(config)
    ref_model = build_ref_pizero(cfg)
    state = load_torch_state_dict(checkpoint)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in state.items()},
        strict=False,
    )
    print(f"reference load: {len(missing)} missing / {len(unexpected)} "
          f"unexpected keys")
    ref_model = ref_model.float().eval()

    model = PiZero(cfg)
    params = pizero_params_from_torch_checkpoint(checkpoint, dtype=jnp.float32)

    # shared tiny input (batch 1, synthetic image/instruction)
    rng = np.random.RandomState(0)
    seq = cfg["max_image_text_tokens"]
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    ids = np.zeros((1, seq), np.int64)
    am = np.zeros((1, seq), np.int64)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + 6] = rng.randint(3, 1000, (1, 6))
    am[:, : n_img + 6] = 1
    img = cfg["vision"]["config"]["image_size"]
    px = (rng.rand(1, 3, img, img).astype(np.float32)) * 2 - 1
    pr = rng.randn(1, cfg["cond_steps"], cfg["proprio_dim"]).astype(np.float32)

    torch.manual_seed(0)
    noise = torch.randn(1, cfg["horizon_steps"], cfg["action_dim"])

    ids_t = torch.tensor(ids)
    am_t = torch.tensor(am)
    full, vp, pp, ap = ref_model.build_causal_mask_and_position_ids(
        am_t, torch.float32
    )
    prefix, action_m = ref_model.split_full_mask_into_submasks(full)
    torch.manual_seed(0)  # reference samples the same noise internally
    out_ref = ref_model.infer_action(
        ids_t, torch.tensor(px), prefix, action_m, vp, pp, ap, torch.tensor(pr)
    )

    out_jax = jax.jit(model.infer_action)(
        params,
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(am, jnp.int32),
        jnp.asarray(px),
        jnp.asarray(pr),
        jnp.asarray(t2n(noise)),
    )
    return float(np.abs(np.asarray(out_jax) - t2n(out_ref)).max())


if __name__ == "__main__":
    main()
