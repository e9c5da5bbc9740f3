#!/usr/bin/env python3
"""Export a JAX Pi-0 parameter tree to a reference-loadable ``.pt``.

Closes the interop loop (the reference is load-only): weights trained or
fine-tuned here (scripts/train_pi0_flow.py --save-dir) deploy on the
reference CUDA stack unchanged — ``torch.load(out)["model"]`` has the exact
key names/shapes of the reference's ``PiZero.state_dict()``
(reference src/model/vla/pizero.py module tree; strict-load proven in
tests/test_reference_parity_e2e.py::TestTorchExportDifferential).

    python scripts/export_torch_checkpoint.py \
        --config config/eval/bridge.yaml \
        --params runs/ft_ckpt --out /tmp/bridge_ft.pt
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

log = logging.getLogger("export_torch_checkpoint")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="config/eval/bridge.yaml")
    p.add_argument("--params", type=str, required=True,
                   help="Orbax checkpoint dir (save_params / --save-dir), or "
                        "'random' for a smoke export of random-init weights.")
    p.add_argument("--out", type=str, required=True, help="Output .pt path")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    import jax
    import jax.numpy as jnp

    from blurr_tpu.benchmarks import load_cfg
    from blurr_tpu.models.pi0.checkpoint import (
        restore_params,
        save_torch_checkpoint,
    )
    from blurr_tpu.models.pi0.pizero import PiZero

    cfg = load_cfg(args.config)
    model = PiZero(cfg)
    if str(args.params).lower() == "random":
        params = model.init_params(jax.random.PRNGKey(args.seed), jnp.float32)
        params = model.tie_action_proprio_weights(params)
    else:
        # shape-only templates (no weight materialization); saved trees may
        # be full/tied or training-canonical (tied proprio -> None)
        full = jax.eval_shape(
            lambda: model.init_params(jax.random.PRNGKey(0), jnp.float32)
        )
        canon = model.canonicalize_tied_weights(
            model.tie_action_proprio_weights(dict(full))
        )
        try:
            params = restore_params(args.params, like=full)
        except Exception:
            params = restore_params(args.params, like=canon)
            log.info("restored a training-canonical (tied) tree")
    save_torch_checkpoint(params, args.out)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
