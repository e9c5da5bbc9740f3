"""AOT capacity probe for the OpenVLA-7B action server: per-batch-bucket
peak HBM from XLA buffer assignment, WITHOUT touching chip memory.

Motivation (2026-08-19): the first OpenVLA server SLO sweep OOMed on the
real chip — bf16 at max_batch=4 failed at AOT compile ("Used 17.49G of
15.75G hbm"), w8a8 at max_batch=8 failed at warmup execution
(RESOURCE_EXHAUSTED). Trial-and-error on the chip costs ~5 min/attempt and
a crashed subprocess each time; this probe instead lowers the EXACT server
step (`OpenVLA.predict_action_tokens_ragged`, same shapes the server's
_prepare produces) with ABSTRACT params (jax.eval_shape over the init), so
the axon compiler's buffer assignment reports args/temp/peak bytes per
bucket with zero arrays materialized.

Writes docs/results/openvla_serving_memory_v5e.csv: one row per
(quant, batch) with fits/peak_gb — the measured source for the SLO
harness's PRESETS max_batch values.
"""

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from blurr_tpu.utils.monitor import compiled_hbm_gb

HBM_GB = 15.75  # v5e usable HBM as reported by the compiler's OOM message
MAX_TEXT_TOKENS = 32  # server default (openvla_server.py)
OUT_CSV = (Path(__file__).resolve().parents[1] / "docs" / "results"
           / "openvla_serving_memory_v5e.csv")


def abstract_params(spec, quant, dtype):
    """Abstract [shape/dtype-only] param tree matching build_openvla's
    memory-safe quantized init (build.py:131-150) or the plain init."""
    from blurr_tpu.models.openvla.llama import (
        init_llama_params_w4a8,
        init_llama_params_w8a8,
    )
    from blurr_tpu.models.openvla.model import OpenVLA

    model = OpenVLA(spec)

    def build(key):
        p = model.init_params(key, dtype)
        if quant == "w8a8":
            p["llama"] = init_llama_params_w8a8(key, spec.llama, dtype)
        elif quant == "w4a8":
            p["llama"] = init_llama_params_w4a8(key, spec.llama, dtype)
        return p

    return model, jax.eval_shape(build, jax.random.PRNGKey(0))


def probe(model_id="random-7b", quants=(None, "w8a8", "w4a8"),
          batches=(1, 2, 4, 8, 16)):
    from blurr_tpu.models.openvla.model import RANDOM_SPECS

    dtype = jnp.bfloat16
    spec = RANDOM_SPECS[model_id]()
    n_px_ch = 6 if spec.use_fused_vision else 3
    img = spec.siglip.image_size
    rows = []
    for quant in quants:
        model, p_abs = abstract_params(spec, quant, dtype)

        def step(params, ids, px, am):
            return model.predict_action_tokens_ragged(params, ids, px, am)

        jitted = jax.jit(step)
        for b in batches:
            ids = jax.ShapeDtypeStruct((b, MAX_TEXT_TOKENS), jnp.int32)
            am = jax.ShapeDtypeStruct((b, MAX_TEXT_TOKENS), jnp.int32)
            px = jax.ShapeDtypeStruct((b, n_px_ch, img, img), dtype)
            tag = f"{model_id} {quant or 'bf16'} batch={b}"
            try:
                compiled = jitted.lower(p_abs, ids, px, am).compile()
            except Exception as e:  # compile-time OOM is a DATA POINT
                msg = str(e).splitlines()[0][:120]
                print(f"{tag}: COMPILE FAILED: {msg}", flush=True)
                rows.append({"model": model_id, "quant": quant or "bf16",
                             "batch": b, "fits": 0, "peak_gb": "",
                             "args_gb": "", "temp_gb": "",
                             "note": "compile OOM"})
                continue
            ma = compiled_hbm_gb(compiled)
            peak = ma.get("peak_gb", 0.0)
            fits = int(bool(ma) and peak <= HBM_GB)
            print(f"{tag}: peak {peak:.2f} GB "
                  f"(args {ma.get('argument_gb', 0):.2f} "
                  f"temp {ma.get('temp_gb', 0):.2f}) -> "
                  f"{'fits' if fits else 'EXCEEDS ' + str(HBM_GB)}",
                  flush=True)
            rows.append({"model": model_id, "quant": quant or "bf16",
                         "batch": b, "fits": fits,
                         "peak_gb": round(peak, 3),
                         "args_gb": round(ma.get("argument_gb", 0.0), 3),
                         "temp_gb": round(ma.get("temp_gb", 0.0), 3),
                         "note": ""})
    return rows


def main():
    rows = probe()
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV} ({len(rows)} rows)", flush=True)


if __name__ == "__main__":
    main()
