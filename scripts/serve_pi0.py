#!/usr/bin/env python3
"""Run the Pi-0 action server (deployment surface; the reference ships no
serving daemon — SURVEY.md §0).

    python scripts/serve_pi0.py --config config/eval/bridge.yaml \
        --checkpoint /path/to/ckpt.pt --preset blurr --port 8787

Clients: blurr_tpu.serving.ActionClient.predict(image_u8_hw3, instruction,
proprio) -> raw normalized action chunk [horizon, action_dim].
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
    p.add_argument("--config", type=str, default="config/eval/bridge.yaml")
    p.add_argument("--checkpoint", type=str, default="random")
    p.add_argument(
        "--preset", type=str, default="blurr",
        choices=["baseline", "vanilla", "prefix_cache", "blurr", "step1"],
    )
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-batch", type=int, default=1,
                   help="Dynamic batching: requests arriving within "
                        "--batch-window-ms are padded to the next power-of-2 "
                        "bucket and served by ONE device program.")
    p.add_argument("--batch-window-ms", type=float, default=2.0)
    p.add_argument("--bucket-mode", type=str, default="pow2",
                   choices=["pow2", "max"],
                   help="max: pad every dynamic batch to --max-batch — ONE "
                        "compiled program / one resident temp arena (for "
                        "HBM-tight models; the runtime keeps every warmed "
                        "bucket's arena resident). pow2: per-size buckets "
                        "(less padding compute at low occupancy).")
    p.add_argument("--max-queue", type=int, default=0,
                   help="Backpressure: reject requests when more than this "
                        "many are queued unclaimed (0 = admit everything). "
                        "Rejected requests get an immediate Overloaded "
                        "error and count in stats rejected_total.")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel serving over a (1, tp) device mesh "
                        "(capacity path: per-chip weight bytes divided by tp; "
                        "heads/MLP split per blurr_tpu/parallel/mesh.py).")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel serving over the 'data' mesh axis "
                        "(throughput path: each dynamic batch splits over dp "
                        "chips; power of 2, requires --max-batch >= dp; "
                        "composes with --tp on a (dp, tp) mesh).")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    from blurr_tpu.benchmarks import load_cfg
    from blurr_tpu.serving.server import ActionServer

    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from eval_pi0_simpler import _apply_preset

    cfg = load_cfg(args.config)
    _apply_preset(cfg, args.preset)
    server = ActionServer(cfg, args.checkpoint, seed=args.seed,
                          max_batch=args.max_batch,
                          batch_window_ms=args.batch_window_ms, tp=args.tp,
                          dp=args.dp, max_queue=args.max_queue,
                          bucket_mode=args.bucket_mode)
    logging.info("warming up (XLA compile)...")
    logging.info("warmup took %.1f s", server.warmup())
    server.serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
