#!/usr/bin/env python3
"""Ops CLI for a RUNNING action server (Pi-0 or OpenVLA — same protocol).

    python scripts/serve_ctl.py stats  --port 8787
    python scripts/serve_ctl.py reload /path/to/ckpt --port 8787 [--drop-first]

`stats` prints the server's observability snapshot (health check, request/
error/rejected totals, latency percentiles, batch occupancy, live
checkpoint, reload count) as JSON. `reload` hot-swaps the weights with no
restart/recompile (docs/SERVING.md §hot-reload); --drop-first frees the
old tree before loading for models too big to hold twice.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    ps = sub.add_parser("stats", help="print the server's stats snapshot")
    pr = sub.add_parser("reload", help="hot-reload the server's weights")
    pr.add_argument("path", type=str,
                    help="checkpoint path (any format the server's startup "
                         "--checkpoint accepts; 'random' re-inits)")
    pr.add_argument("--drop-first", action="store_true",
                    help="free the old tree BEFORE loading (non-atomic; for "
                         "trees too big to hold twice, e.g. bf16-7B on 16 GB)")
    for q in (ps, pr):
        q.add_argument("--host", type=str, default="127.0.0.1")
        q.add_argument("--port", type=int, default=8787)
    args = p.parse_args(argv)

    from blurr_tpu.serving.client import ActionClient

    with ActionClient(args.host, args.port) as client:
        if args.cmd == "stats":
            out = client.stats()
        else:
            out = client.reload(args.path, drop_first=args.drop_first)
    print(json.dumps(out, indent=2, sort_keys=True, default=str))


if __name__ == "__main__":
    main()
