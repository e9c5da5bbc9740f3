"""Measure the activation-HBM saving of --remat on the training backward.

AOT-compiles, at FULL bridge.yaml dims (bf16 weights) from ShapeDtypeStructs
only (no arrays allocated):
  mode=grad        jax.value_and_grad(flow_loss), with/without remat — the
                   isolated activation-memory effect of jax.checkpoint;
  mode=train_step  the COMPLETE production step (masked adamw + in-step
                   noise/flow-time sampling, make_optax_train_step) at
                   action_expert and all-params scopes — params, grads AND
                   optimizer moments count, which mode=grad understates —
                   with and without buffer donation (donate=True is what
                   scripts/train_pi0_flow.py actually runs: params+opt_state
                   update in place, saving a full copy of both).
All probes use the TRAINING-CANONICAL tied tree (tie_action_proprio_weights
-> canonicalize_tied_weights), like every production training path: the
proprio mixture rides the action weights, so neither duplicate parameters
nor duplicate adamw moments are allocated.
Reads XLA's buffer assignment (compiled.memory_analysis — the same source
bench.py's peak_hbm uses). temp_gb is the activation/workspace footprint
remat trades against recompute FLOPs.

Run on the v5e (compiles remotely over the tunnel, ~1-2 min per program).
Writes docs/results/remat_memory_v5e.csv.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from blurr_tpu.utils.optim import masked_freeze
from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import compiled_hbm_gb

BATCHES = [8, 32]
OUT_CSV = Path(__file__).resolve().parents[1] / "docs" / "results" / "remat_memory_v5e.csv"


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    cfg["use_bf16"] = True
    model = PiZero(cfg)
    shapes = jax.eval_shape(
        lambda: model.init_params(jax.random.PRNGKey(0), jnp.bfloat16)
    )
    # the production training tree: tied, then canonical (proprio -> None,
    # resolved to the action weights inside the forward). eval_shape'd tie
    # aliases the subtree objects, which canonicalize detects by identity.
    shapes = model.canonicalize_tied_weights(
        model.tie_action_proprio_weights(shapes)
    )
    assert shapes["joint"]["proprio"] is None

    seq = cfg["max_image_text_tokens"]
    img = cfg["vision"]["config"]["image_size"]

    def batch_shapes(bsz):
        f = jax.ShapeDtypeStruct
        return (
            f((bsz, seq), jnp.int32),                                   # ids
            f((bsz, seq), jnp.int32),                                   # am
            f((bsz, 3, img, img), jnp.bfloat16),                        # px
            f((bsz, cfg["cond_steps"], cfg["proprio_dim"]), jnp.bfloat16),
            f((bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16),
            f((bsz,), jnp.float32),                                     # t
            f((bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16),
        )

    import optax

    from blurr_tpu.models.pi0 import trainable
    from blurr_tpu.parallel.train import make_optax_train_step

    def full_step_fn(scope, remat, donate):
        """AOT-compile the COMPLETE production train step (masked adamw with
        warmup-cosine schedule + in-step noise/flow-time sampling) from
        abstract shapes — params, grads, AND the optimizer moments all count
        against HBM, which value_and_grad alone understates. donate=True is
        the production configuration (train_pi0_flow.py): XLA reuses the
        params/opt_state input buffers for the outputs."""
        mask = {
            "action_expert": trainable.action_expert_mask,
            "all": trainable.all_trainable_mask,
        }[scope](shapes)
        tx = masked_freeze(
            optax.adamw(optax.warmup_cosine_decay_schedule(1e-6, 1e-4, 10, 100)),
            mask,
        )
        opt_shapes = jax.eval_shape(tx.init, shapes)
        step = make_optax_train_step(model, tx, remat=remat, donate=donate)
        return step, opt_shapes

    def train_batch_shapes(bsz):
        f = jax.ShapeDtypeStruct
        return {
            "input_ids": f((bsz, seq), jnp.int32),
            "attention_mask": f((bsz, seq), jnp.int32),
            "pixel_values": f((bsz, 3, img, img), jnp.bfloat16),
            "proprios": f((bsz, cfg["cond_steps"], cfg["proprio_dim"]), jnp.bfloat16),
            "actions": f((bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16),
        }

    key_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)

    rows = []
    probes = [("grad", None, b, r, False) for b in BATCHES for r in (False, True)] + [
        ("train_step", scope, b, True, donate)
        for scope in ("action_expert", "all")
        for b in BATCHES
        for donate in (False, True)
    ]
    for mode, scope, bsz, remat, donate in probes:
        try:
            if mode == "grad":
                def vg(params, *args, _remat=remat):
                    return jax.value_and_grad(
                        lambda p: model.flow_loss(p, *args, remat=_remat)
                    )(params)

                compiled = jax.jit(vg).lower(shapes, *batch_shapes(bsz)).compile()
            else:
                step, opt_shapes = full_step_fn(scope, remat, donate)
                compiled = step.lower(
                    shapes, opt_shapes, train_batch_shapes(bsz), key_shape
                ).compile()
            hbm = compiled_hbm_gb(compiled)
            row = {
                "mode": mode,
                "scope": scope or "",
                "batch": bsz,
                "remat": remat,
                "donate": donate,
                "args_gb": round(hbm.get("argument_gb", float("nan")), 3),
                "temp_gb": round(hbm.get("temp_gb", float("nan")), 3),
                "peak_gb": round(hbm.get("peak_gb", float("nan")), 3),
                "fits_16gb": hbm.get("peak_gb", 1e9) < 15.5,
            }
        except Exception as exc:  # remote compiler OOM-rejects etc.
            # keep only the OOM headline (the full axon log is ~200 lines
            # of ANSI-escaped tracing)
            import re

            m = re.search(
                r"Ran out of memory in memory space hbm\.[^\n]*", str(exc)
            )
            msg = m.group(0) if m else (str(exc).splitlines() or ["?"])[0][:200]
            row = {"mode": mode, "scope": scope or "", "batch": bsz,
                   "remat": remat, "donate": donate, "args_gb": "",
                   "temp_gb": "", "peak_gb": "",
                   "fits_16gb": f"compile failed: {msg}"}
        rows.append(row)
        print(row, flush=True)

    OUT_CSV.parent.mkdir(parents=True, exist_ok=True)
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV}", flush=True)


if __name__ == "__main__":
    main()
