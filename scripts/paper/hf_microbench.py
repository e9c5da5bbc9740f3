#!/usr/bin/env python3
"""OpenVLA-family microbench grid: models x dtype/compile profiles -> CSV.

Parity surface: reference scripts/paper/hf_microbench.py (same profile names
fp32_eager / bf16_eager / bf16_compile / fp16_compile, same CSV columns,
graceful OOM skip). The native JAX stack always jits, so the *_eager profiles
differ only in dtype; fp16 maps to bf16 on TPU. TPU extension:
``w8a8_compile`` runs the int8-MXU W8A8 LLM (the serving-grade 7B tier) —
memory-safe quantized init for the random 7B, PTQ of the loaded tree for
snapshot dirs.
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path
from typing import Dict, List

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _profiles(spec: List[str]) -> List[Dict]:
    out = []
    for item in spec:
        item = item.strip().lower()
        if item == "fp32_eager":
            out.append({"name": item, "dtype": "fp32", "compile": False})
        elif item == "bf16_eager":
            out.append({"name": item, "dtype": "bf16", "compile": False})
        elif item == "bf16_compile":
            out.append({"name": item, "dtype": "bf16", "compile": True})
        elif item == "fp16_compile":
            out.append({"name": item, "dtype": "fp16", "compile": True})
        elif item == "w8a8_compile":
            out.append({"name": item, "dtype": "bf16", "compile": True,
                        "quant": "w8a8"})
        else:
            raise ValueError(f"Unknown profile: {item}")
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-csv", type=str, required=True)
    parser.add_argument("--model-id", type=str, nargs="+", required=True)
    parser.add_argument(
        "--prompt", type=str, default="In: What action should the robot take?\nOut:"
    )
    parser.add_argument("--image", type=str, default="")
    parser.add_argument("--attn-implementation", type=str, default="")
    parser.add_argument("--unnorm-key", type=str, default=None)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--skip-flops", action="store_true")
    parser.add_argument(
        "--profiles", type=str, nargs="+", default=["fp32_eager", "bf16_compile"]
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.model import EMPTY_TOKEN, OpenVLA, OpenVLASpec
    from blurr_tpu.models.openvla.processing import OpenVLAProcessor
    from blurr_tpu.utils.flops import openvla_forward_flops
    from blurr_tpu.utils.monitor import peak_tpu_memory_gb, timed_call

    out_csv = Path(args.out_csv).expanduser().resolve()
    out_csv.parent.mkdir(parents=True, exist_ok=True)

    rows = []
    for model_id in args.model_id:
        for profile in _profiles(args.profiles):
            dtype = jnp.float32 if profile["dtype"] == "fp32" else jnp.bfloat16
            quant = profile.get("quant")
            note = "fp16->bf16 (TPU)" if profile["dtype"] == "fp16" else ""
            latency_s = peak_gb = gflops = None
            tokenizer = None
            try:
                model_path = Path(model_id).expanduser()
                if model_path.is_dir():
                    from blurr_tpu.models.openvla.checkpoint import (
                        openvla_params_from_hf_dir,
                    )

                    spec = OpenVLASpec.from_snapshot_dir(model_path)
                    model = OpenVLA(spec)
                    params = openvla_params_from_hf_dir(str(model_path), spec, dtype)
                    if quant:
                        from blurr_tpu.models.openvla.llama import (
                            quantize_llama_w8a8,
                        )

                        params["llama"] = quantize_llama_w8a8(params["llama"])
                    # real snapshot: use the real tokenizer so the measured
                    # prompt length matches benchmark_hf_vla.py (the stub
                    # hash tokenizer gives a different token count)
                    from blurr_tpu.models.openvla.processing import (
                        load_hf_tokenizer,
                    )

                    tokenizer = load_hf_tokenizer(str(model_path))
                elif model_id in ("random-7b", "openvla-7b-random"):
                    spec = OpenVLASpec()
                    if dtype == jnp.float32:
                        raise MemoryError(
                            "Skipping FP32 7B on a 16GB chip (likely OOM)."
                        )
                    model = OpenVLA(spec)
                    if quant:
                        # memory-safe: init the LLM straight in quantized
                        # form (bf16 7B + int8 copies together OOM 16 GB;
                        # same route as models/openvla/build.py)
                        import gc

                        from blurr_tpu.models.openvla.llama import (
                            init_llama_params_w8a8,
                        )

                        params = model.init_params(jax.random.PRNGKey(0), dtype)
                        params["llama"] = None
                        gc.collect()
                        params["llama"] = init_llama_params_w8a8(
                            jax.random.PRNGKey(0), spec.llama, dtype
                        )
                    else:
                        params = model.init_params(jax.random.PRNGKey(0), dtype)
                else:
                    from blurr_tpu.models.openvla.model import RANDOM_SPECS

                    # 'random-minivla' etc. resolve to their real specs —
                    # the old tiny() fallback silently benchmarked the
                    # wrong model for every non-7b random id
                    spec = RANDOM_SPECS.get(model_id, OpenVLASpec.tiny)()
                    model = OpenVLA(spec)
                    params = model.init_params(jax.random.PRNGKey(0), dtype)
                    if quant:
                        from blurr_tpu.models.openvla.llama import (
                            quantize_llama_w8a8,
                        )

                        params["llama"] = quantize_llama_w8a8(params["llama"])

                processor = OpenVLAProcessor(
                    tokenizer,
                    image_size=spec.siglip.image_size,
                    fused=spec.use_fused_vision,
                )
                image = np.random.RandomState(0).randint(
                    0, 256, (256, 256, 3), np.uint8
                )
                batch = processor(args.prompt, image)
                ids = jnp.asarray(batch["input_ids"])
                ids = jnp.concatenate(
                    [ids, jnp.full((1, 1), EMPTY_TOKEN, ids.dtype)], axis=1
                )
                px = jnp.asarray(batch["pixel_values"], dtype)
                step = jax.jit(model.predict_action_tokens)
                latency_s, _, _ = timed_call(
                    step, params, ids, px, warmup=args.warmup, iters=args.iters
                )
                peak_gb = peak_tpu_memory_gb()
                if not args.skip_flops:
                    gflops = (
                        openvla_forward_flops(spec, prompt_len=int(ids.shape[1]) - 1)
                        / latency_s
                        / 1e9
                    )
                del params, model
            except (MemoryError, Exception) as exc:  # graceful OOM/failure skip
                note = (note + "; " if note else "") + f"skipped: {exc}"

            rows.append(
                {
                    "model_id": model_id,
                    "profile": profile["name"],
                    "dtype": profile["dtype"],
                    "compile": bool(profile["compile"]),
                    "attn_implementation": args.attn_implementation,
                    "latency_ms": None
                    if latency_s is None
                    else round(latency_s * 1000.0, 4),
                    "peak_reserved_gb": None if peak_gb is None else round(peak_gb, 4),
                    "gflops": None if gflops is None else round(gflops, 4),
                    "note": note,
                }
            )

    with out_csv.open("w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"Wrote: {out_csv}")


if __name__ == "__main__":
    main()
