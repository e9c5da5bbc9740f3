#!/usr/bin/env python3
"""Benchmark predict_action latency for OpenVLA-family models, TPU-native.

CLI/output parity with reference scripts/benchmark_hf_vla.py, but the model
is the native JAX OpenVLA stack (fused DINOv2+SigLIP -> Llama-7B greedy
decode in one jitted program) instead of HF remote code. ``--model-id`` may
be an HF snapshot directory (weights loaded via the checkpoint bridge) or
'random' / 'random-7b' for random-init latency work.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    p = argparse.ArgumentParser(
        description="Benchmark predict_action latency for OpenVLA-family VLAs."
    )
    p.add_argument(
        "--model-id",
        type=str,
        default="random",
        help="HF snapshot dir, or 'random' (tiny) / 'random-7b' (full "
             "dims) / 'random-minivla' (Qwen2.5-0.5B prismatic dims).",
    )
    p.add_argument(
        "--prompt",
        type=str,
        default="In: What action should the robot take to pick up the carrot?\nOut:",
    )
    p.add_argument("--image", type=str, default="")
    p.add_argument("--unnorm-key", type=str, default=None)
    p.add_argument("--use-bf16", action="store_true")
    p.add_argument(
        "--decode", type=str, default="ar", choices=["ar", "jacobi"],
        help="jacobi: lossless self-speculative decode — all action tokens "
        "verified per multi-token forward (weights stream once per "
        "iteration instead of once per token; tokens bit-identical to ar, "
        "tests/test_openvla.py::test_jacobi_decode_bit_identical_to_greedy).")
    p.add_argument(
        "--quantization", type=str, default="none",
        choices=["none", "w8a8", "w4a8"],
        help="w8a8: dynamic int8 activations x int8 weights for the LLM "
        "(halves decode weight reads; TPU extension). w4a8: nibble-packed "
        "int4 weights via the fused Pallas kernel (half the w8a8 bytes; "
        "coarser quantizer — experimental).",
    )
    p.add_argument("--use-fp16", action="store_true")
    p.add_argument("--use-torch-compile", action="store_true",
                   help="Parity flag; jax.jit is always on.")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-flops", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.models.openvla.checkpoint import infer_unnorm_key
    from blurr_tpu.models.openvla.processing import OpenVLAProcessor
    from blurr_tpu.utils.flops import openvla_forward_flops
    from blurr_tpu.utils.monitor import peak_tpu_memory_gb, timed_call

    dtype = jnp.bfloat16 if (args.use_bf16 or args.use_fp16) else jnp.float32

    # shared model-id resolution (models/openvla/build.py; also the server,
    # trainer, and open-loop evaluator). memory_safe_quant_init: the
    # checkpoint-free 7B builds its LLM directly in quantized form.
    try:
        built = build_openvla(
            args.model_id, dtype=dtype, quantization=args.quantization,
            memory_safe_quant_init=True,
        )
    except ValueError as exc:
        sys.exit(str(exc))
    model, params, spec = built.model, built.params, built.spec
    tokenizer = built.tokenizer
    norm_stats, dataset_stats = built.norm_stats, built.dataset_stats

    unnorm_key = None
    if norm_stats:
        # the BENCHMARK ordering (reference benchmark_hf_vla.py:217-226):
        # dataset-statistics intersection beats 'bridge_orig' — the opposite
        # of the eval script's preference (see infer_unnorm_key)
        unnorm_key = infer_unnorm_key(
            norm_stats, args.unnorm_key, dataset_stats=dataset_stats,
            prefer_dataset_stats=True,
        )

    processor = OpenVLAProcessor(
        tokenizer, image_size=spec.siglip.image_size, fused=spec.use_fused_vision
    )
    if args.image and Path(args.image).exists():
        from PIL import Image

        image = np.array(Image.open(args.image).convert("RGB"))
    else:
        image = np.random.RandomState(0).randint(0, 256, (256, 256, 3), np.uint8)
    inputs = processor(args.prompt, image)
    input_ids = jnp.asarray(inputs["input_ids"])
    from blurr_tpu.models.openvla.model import EMPTY_TOKEN

    if int(input_ids[0, -1]) != EMPTY_TOKEN:
        input_ids = jnp.concatenate(
            [input_ids, jnp.full((1, 1), EMPTY_TOKEN, input_ids.dtype)], axis=1
        )
    pixel_values = jnp.asarray(inputs["pixel_values"], dtype)

    jacobi_iters = None
    if args.decode == "jacobi":
        valid = jnp.ones_like(input_ids)
        # bf16-7B: the Jacobi program needs the stacked q/k/v in the
        # transposed device layout or it compile-OOMs on a 16 GB chip
        # (llama.relayout_qkv_for_jacobi); no-op for quantized trees.
        from blurr_tpu.models.openvla import llama as llama_lib

        params = llama_lib.relayout_qkv_for_jacobi(params)

        # one jit for both the iteration count and the timed step — a
        # second program shape would cost another ~15 s remote compile
        jac = jax.jit(
            lambda p, i, x: model.predict_action_tokens_jacobi(
                p, i, x, valid, return_iters=True)
        )
        _, iters = jac(params, input_ids, pixel_values)
        jacobi_iters = int(iters)

        def step(params, ids, px):
            return jac(params, ids, px)[0]
    else:
        step = jax.jit(model.predict_action_tokens)
    avg_latency, _, _ = timed_call(
        step, params, input_ids, pixel_values, warmup=args.warmup, iters=args.iters
    )
    peak_mem = peak_tpu_memory_gb()

    gflops = None
    if not args.skip_flops:
        total = openvla_forward_flops(spec, prompt_len=int(input_ids.shape[1]) - 1)
        gflops = total / avg_latency / 1e9

    dtype_name = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    print("========== Benchmark Summary ==========")
    print(f"Model id: {args.model_id}")
    print(f"Prompt: {args.prompt}")
    print(f"Image: {Path(args.image).resolve() if args.image else '(synthetic)'}")
    print(f"Device: {jax.devices()[0]}")
    print(f"Dtype: jax.{dtype_name}")
    print(f"Quantization: {args.quantization}")
    if jacobi_iters is not None:
        print(f"Decode: jacobi ({jacobi_iters} iterations; tokens "
              "bit-identical to greedy AR)")
    print(f"torch.compile: {True}")
    print(f"Unnorm key: {unnorm_key}")
    print(f"Warmup iterations: {args.warmup}")
    print(f"Timed iterations: {args.iters}")
    print(f"Average latency: {avg_latency * 1000:.2f} ms")
    print(f"Peak reserved TPU memory: {peak_mem:.2f} GB")
    if gflops is not None:
        print(f"Approximate GFLOPS: {gflops:,.2f}")
    else:
        print("GFLOPS skipped (--skip-flops).")
    print("=======================================")


if __name__ == "__main__":
    main()
