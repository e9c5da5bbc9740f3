"""Settle the direct-vs-queued inversion in serving_slo_v5e.csv.

The shipped sweep measured pool64-w8a8 direct predict() (p50 69.3 ms)
SLOWER than queued predict() (45.0 ms) — physically backwards, attributed
to tunnel jitter between the two 30-call blocks. This re-measures both
modes INTERLEAVED (ABAB...), so slow tunnel minutes hit both equally, and
reports paired statistics: the per-pair delta distribution is immune to
drift that the blocked measurement confounds.

Run on the v5e (~4 min, warmup compiles dominate). Prints one summary line
per preset; updates docs/results/serving_slo_v5e.md by hand afterwards.
"""

from __future__ import annotations

import base64
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from blurr_tpu.benchmarks import load_cfg
from blurr_tpu.serving.server import ActionServer
from experiments.serving_slo import _request_payload

PAIRS = 40
CFG = "config/eval/bridge_pool64_w8a8_steps1.yaml"


def main():
    cfg = load_cfg(CFG)
    cfg["use_bf16"] = True
    server = ActionServer(cfg, "random", max_batch=16)
    print(f"warmup: {server.warmup():.1f}s", flush=True)

    img_hw = int(cfg["vision"]["config"]["image_size"])
    payload = _request_payload(img_hw, int(cfg["proprio_dim"]))
    img = np.frombuffer(base64.b64decode(payload["image"]), np.uint8).reshape(
        img_hw, img_hw, 3
    )

    def call():
        return server.predict(img, payload["instruction"], payload["proprio"])

    def timed():
        t0 = time.time()
        call()
        return time.time() - t0

    # settle both paths (first-call queue/thread setup)
    for _ in range(5):
        server.max_batch = 1
        call()
        server.max_batch = 16
        call()

    direct, queued = [], []
    for _ in range(PAIRS):
        server.max_batch = 1  # direct branch: no queue, no window
        direct.append(timed())
        server.max_batch = 16  # through the dynamic batcher
        queued.append(timed())

    d = np.asarray(direct) * 1000
    q = np.asarray(queued) * 1000
    delta = q - d  # paired: positive = batcher overhead
    print(
        f"pairs={PAIRS} direct p50={np.percentile(d, 50):.1f} ms "
        f"queued p50={np.percentile(q, 50):.1f} ms | paired delta "
        f"p50={np.percentile(delta, 50):.1f} ms "
        f"mean={delta.mean():.1f} ms iqr=[{np.percentile(delta, 25):.1f}, "
        f"{np.percentile(delta, 75):.1f}] ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
