#!/usr/bin/env python3
"""Record SYNTHETIC rollout clips for the demo page's clip grid.

Runs the real EvalAgent closed loop (tiny random-init Pi-0 by default) on
the FakeSimplerEnv and copies the recorded episodes into ``demo/clips/``
as clip1..clipN. Clips are mp4 when an ffmpeg backend exists, animated GIF
otherwise (the agent's video writer degrades automatically).

These are NOT SimplerEnv rollouts — the fake env's frames are an abstract
pose-tracking visualization. They exist so the demo page's video grid and
the n_video recording path are exercised end-to-end; the page labels them
synthetic. Real clips need SimplerEnv + a checkpoint (see demo/index.html).

Usage: python scripts/record_demo_clips.py [--n 8] [--config ...] [--full]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=8, help="number of clips")
    p.add_argument("--out", type=str, default=str(REPO / "demo" / "clips"))
    p.add_argument("--full", action="store_true",
                   help="full bridge.yaml dims (TPU) instead of tiny CPU dims")
    p.add_argument("--checkpoint", type=str, default=None)
    args = p.parse_args()

    if not args.full:
        # MUST precede any blurr_tpu import: the package pins the platform
        # (axon) at import time; without this the tiny model runs over the
        # slow TPU tunnel instead of locally on CPU
        os.environ.setdefault("BLURR_PLATFORM", "cpu")

    from blurr_tpu.agent.eval_agent import EvalAgent
    from blurr_tpu.config.core import Config

    if args.full:
        from blurr_tpu.benchmarks import load_cfg

        cfg = load_cfg("config/eval/bridge_step1.yaml")
    else:
        from tests.util import tiny_pi0_cfg

        cfg = tiny_pi0_cfg()
        cfg["image_token_index"] = 257152
        cfg["vocab_size"] = 258000
        cfg["env"] = Config.wrap({
            "task": "fake_widowx_carrot_on_plate",
            "adapter": {
                "_target_": "blurr_tpu.agent.env_adapter.simpler.BridgeSimplerAdapter",
                "dataset_statistics_path": "config/bridge_statistics.json",
                "pretrained_model_path": "(stub)",
                "tokenizer_padding": "max_length",
                "max_seq_len": cfg["max_seq_len"],
                "num_image_tokens": cfg["vision"]["config"]["num_image_tokens"],
                "image_size": [cfg["vision"]["config"]["image_size"]] * 2,
            },
        })
    log_dir = tempfile.mkdtemp(prefix="blurr_demo_clips_")
    cfg.update({
        "log_dir": log_dir,
        "n_eval_episode": args.n,
        "n_video": args.n,
        "seed": 42,
        "act_steps": int(cfg.get("act_steps") or 4),
        "use_bf16": bool(args.full),
        "use_prefix_kv_cache": True,
        "checkpoint_path": args.checkpoint,
    })
    cfg["env"]["task"] = "fake_widowx_carrot_on_plate"

    if not args.full:
        # small frames + 2-step chunks: the fake env's noise background
        # compresses terribly in GIF, keep the repo payload small
        cfg["act_steps"] = 2
        import blurr_tpu.agent.eval_agent as eval_agent_mod
        from blurr_tpu.agent.fake_env import FakeSimplerEnv

        orig_make = eval_agent_mod.make_env
        eval_agent_mod.make_env = lambda task: FakeSimplerEnv(
            task, image_hw=(96, 128)
        )
        try:
            agent = EvalAgent(cfg)
        finally:
            eval_agent_mod.make_env = orig_make
    else:
        agent = EvalAgent(cfg)
    agent.run()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    recorded = sorted(
        glob.glob(os.path.join(log_dir, "videos", "video_*.*")),
        key=lambda p: int(Path(p).stem.split("_")[1]),
    )
    for i, src in enumerate(recorded[: args.n], start=1):
        ext = Path(src).suffix
        dst = out / f"clip{i}{ext}"
        shutil.copyfile(src, dst)
        print(f"{src} -> {dst}")
    shutil.rmtree(log_dir, ignore_errors=True)
    if not recorded:
        raise SystemExit("no clips recorded (imageio missing every backend?)")


if __name__ == "__main__":
    main()
