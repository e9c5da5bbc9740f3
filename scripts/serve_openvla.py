#!/usr/bin/env python3
"""Run the OpenVLA-family action server (deployment surface; the reference
ships no serving daemon — SURVEY.md §0; its OpenVLA surface is the
eval/bench scripts).

    python scripts/serve_openvla.py --model-id /path/to/openvla-snapshot \
        --unnorm-key bridge_orig --max-batch 8 --port 8788

Clients: blurr_tpu.serving.ActionClient.predict(image_u8_hw3, instruction,
proprio) -> [action_dim] actions (normalized [-1, 1] unless --unnorm-key).
The proprio field is accepted and ignored (shared request schema with the
Pi-0 server).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-id", type=str, default="random",
                   help="HF snapshot dir, or random / random-7b / "
                        "random-minivla (Qwen2.5-0.5B prismatic dims)")
    p.add_argument("--quantization", type=str, default=None,
                   choices=[None, "w8a8", "w4a8"])
    p.add_argument("--unnorm-key", type=str, default=None,
                   help="norm-stats key for host-side unnormalization")
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8788)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-batch", type=int, default=1)
    p.add_argument("--batch-window-ms", type=float, default=2.0)
    p.add_argument("--bucket-mode", type=str, default="pow2",
                   choices=["pow2", "max"],
                   help="max: pad every dynamic batch to --max-batch — ONE "
                        "compiled program / one resident temp arena. "
                        "Measured on v5e: lets the 7B w8a8 serve "
                        "max_batch=8 (pow2's cumulative bucket arenas OOM "
                        "the 16 GB chip; openvla_serving_memory_v5e.csv).")
    p.add_argument("--max-queue", type=int, default=0,
                   help="Backpressure: reject requests when more than this "
                        "many are queued unclaimed (0 = admit everything).")
    p.add_argument("--decode", type=str, default="ar",
                   choices=["ar", "jacobi"],
                   help="jacobi: lossless self-speculative decode (tokens "
                        "bit-identical to ar; weights stream once per "
                        "Jacobi sweep instead of once per token). AR "
                        "variant only; ignored with --oft.")
    p.add_argument("--max-text-tokens", type=int, default=32)
    p.add_argument("--oft", action="store_true",
                   help="serve the OFT parallel-decoding variant: one "
                        "forward -> continuous [chunk-len, action_dim] "
                        "chunk; loads action_head--*_checkpoint.pt from the "
                        "snapshot dir when present.")
    p.add_argument("--chunk-len", type=int, default=8)
    p.add_argument("--use-proprio", action="store_true",
                   help="OFT: condition on the request's proprio field.")
    p.add_argument("--proprio-dim", type=int, default=8)
    p.add_argument("--checkpoint", type=str, default="",
                   help="Orbax params dir from train_openvla_lora "
                        "--save-params (full tree incl. QLoRA quant dicts "
                        "and LoRA factors); --model-id still supplies the "
                        "architecture spec.")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel over a (dp, tp) mesh — the capacity "
                        "path for the 7B on 16 GB chips.")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel batch split (power of 2, requires "
                        "--max-batch >= dp).")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    from blurr_tpu.serving.openvla_server import OpenVLAActionServer

    server = OpenVLAActionServer(
        args.model_id, quantization=args.quantization,
        unnorm_key=args.unnorm_key, use_bf16=not args.no_bf16,
        seed=args.seed, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms, tp=args.tp, dp=args.dp,
        max_text_tokens=args.max_text_tokens, oft=args.oft,
        chunk_len=args.chunk_len, use_proprio=args.use_proprio,
        proprio_dim=args.proprio_dim,
        checkpoint_path=args.checkpoint or None,
        max_queue=args.max_queue, decode=args.decode,
        bucket_mode=args.bucket_mode,
    )
    logging.info("warming up (XLA compile)...")
    logging.info("warmup took %.1f s", server.warmup())
    server.serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
