"""Measure the activation-HBM saving of --remat on the training backward.

AOT-compiles jax.value_and_grad(flow_loss) at FULL bridge.yaml dims (bf16
weights) with and without jax.checkpoint around the scanned joint layer,
from ShapeDtypeStructs only (no arrays allocated), and reads XLA's buffer
assignment (compiled.memory_analysis — the same source bench.py's peak_hbm
uses). temp_gb is the activation/workspace footprint the remat trades
against recompute FLOPs.

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

    rows = []
    for bsz in BATCHES:
        for remat in (False, True):
            def vg(params, *args, _remat=remat):
                return jax.value_and_grad(
                    lambda p: model.flow_loss(p, *args, remat=_remat)
                )(params)

            try:
                compiled = jax.jit(vg).lower(shapes, *batch_shapes(bsz)).compile()
                hbm = compiled_hbm_gb(compiled)
                row = {
                    "batch": bsz,
                    "remat": remat,
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
                row = {"batch": bsz, "remat": remat, "temp_gb": "",
                       "peak_gb": "", "fits_16gb": f"compile failed: {msg}"}
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
