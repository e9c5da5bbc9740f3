"""Measure weight hot-reload under live traffic on the real chip.

The serving layer's ``{"kind": "reload"}`` hot-reload (server.py
``reload_checkpoint``) claims "zero downtime beyond one batch boundary"
in atomic mode and "requests stall for the load" in ``drop_first`` mode.
This harness puts numbers on both: it runs the fastest production preset
(pool64 + W8A8) under N closed-loop TCP clients, fires reloads mid-stream
through a control connection, and reports

  - steady-state client p50/p95 before any reload,
  - the reload call's own wall time (atomic: off-lock build; drop_first:
    lock held for the whole build),
  - the worst client-observed request latency inside a +/-2 s window
    around each reload (the "stall" a robot controller would see).

Reload target is ``random`` (the server's init path): the build cost
(init + quantize) stands in for a checkpoint load of the same tree, and
no checkpoint artifact is needed. Writes
docs/results/hot_reload_v5e.csv. Run on the v5e; ~3-4 min.
"""

from __future__ import annotations

import base64
import csv
import socket
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from blurr_tpu.benchmarks import load_cfg
from blurr_tpu.serving.client import ActionClient
from blurr_tpu.serving.server import ActionServer, recv_msg, send_msg

CFG = "config/eval/bridge_pool64_w8a8_steps1.yaml"
MAX_BATCH = 4
N_CLIENTS = 4
OUT_CSV = (Path(__file__).resolve().parents[1]
           / "docs" / "results" / "hot_reload_v5e.csv")

# schedule: (t_rel_s, mode). Steady window first, then one reload per mode
# with recovery time between them.
RELOADS = [(8.0, "atomic"), (18.0, "drop_first")]
DURATION_S = 28.0
WINDOW_S = 2.0


def _payload(cfg) -> dict:
    hw = int(cfg["vision"]["config"]["image_size"])
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (hw, hw, 3), np.uint8)
    return {
        "instruction": "put the carrot on the plate",
        "image": base64.b64encode(img.tobytes()).decode("ascii"),
        "image_shape": list(img.shape),
        "proprio": [0.0] * int(cfg["proprio_dim"]),
    }


def _client_loop(port, payload, t0, stop_at, out, errors):
    try:
        # a wedged server must surface as an error, not hang join() forever
        sock = socket.create_connection(("127.0.0.1", port), timeout=30.0)
        try:
            while time.time() < stop_at:
                a = time.time()
                send_msg(sock, payload)
                resp = recv_msg(sock)
                b = time.time()
                assert resp is not None and "actions" in resp, resp
                out.append((b - t0, (b - a) * 1000.0))
        finally:
            sock.close()
    except BaseException as exc:  # noqa: BLE001 — surfaced by parent
        errors.append(exc)


def main():
    global RELOADS, DURATION_S
    smoke = "--smoke" in sys.argv
    if smoke:  # CPU harness check: tiny dims, short schedule, no CSV claims
        from tests.util import tiny_pi0_cfg

        cfg = tiny_pi0_cfg()
        RELOADS = [(3.0, "atomic"), (6.0, "drop_first")]
        DURATION_S = 9.0
    else:
        cfg = load_cfg(CFG)
        cfg["use_bf16"] = True
    print(f"building server (max_batch={MAX_BATCH})...", flush=True)
    server = ActionServer(cfg, "random", max_batch=MAX_BATCH)
    print(f"warmup: {server.warmup():.1f}s", flush=True)

    ready = threading.Event()
    threading.Thread(
        target=server.serve_forever,
        kwargs={"host": "127.0.0.1", "port": 0, "ready_event": ready},
        daemon=True,
    ).start()
    ready.wait(10)
    port = server.port
    payload = _payload(cfg)

    samples = [[] for _ in range(N_CLIENTS)]
    errors: list = []
    t0 = time.time()
    stop_at = t0 + DURATION_S
    threads = [
        threading.Thread(target=_client_loop,
                         args=(port, payload, t0, stop_at, samples[i], errors))
        for i in range(N_CLIENTS)
    ]
    for t in threads:
        t.start()

    reload_events = []  # (mode, t_rel_start, wall_ms, ok)
    ctl = ActionClient("127.0.0.1", port)
    for t_rel, mode in RELOADS:
        time.sleep(max(0.0, t0 + t_rel - time.time()))
        a = time.time()
        try:
            ctl.reload("random", drop_first=(mode == "drop_first"))
            ok = True
        except Exception as exc:  # noqa: BLE001
            print(f"reload {mode} FAILED: {exc!r}", flush=True)
            ok = False
        wall = (time.time() - a) * 1000.0
        reload_events.append((mode, a - t0, wall, ok))
        print(f"reload {mode} @t={a - t0:.1f}s: {wall:.0f} ms "
              f"({'ok' if ok else 'FAILED'})", flush=True)
    ctl.close()

    for t in threads:
        t.join()
    if errors:
        raise RuntimeError(f"{len(errors)} client thread(s) failed; "
                           f"first: {errors[0]!r}")
    server.stop()

    pts = sorted(p for lst in samples for p in lst)
    first_reload = min(tr for _, tr, _, _ in reload_events)
    steady = [ms for tr, ms in pts if 2.0 < tr < first_reload - 0.5]
    rows = [{
        "phase": "steady", "mode": "", "requests": len(steady),
        "p50_ms": round(float(np.percentile(steady, 50)), 1) if steady else "",
        "p95_ms": round(float(np.percentile(steady, 95)), 1) if steady else "",
        "max_ms": round(max(steady), 1) if steady else "",
        "reload_wall_ms": "",
        "reloads_total": "",
    }]
    for mode, tr, wall, ok in reload_events:
        win = [ms for tend, ms in pts if tr - 0.5 < tend < tr + wall / 1e3 + WINDOW_S]
        rows.append({
            "phase": "reload_window", "mode": mode, "requests": len(win),
            "p50_ms": round(float(np.percentile(win, 50)), 1) if win else "",
            "p95_ms": round(float(np.percentile(win, 95)), 1) if win else "",
            "max_ms": round(max(win), 1) if win else "",
            "reload_wall_ms": round(wall, 0),
            "reloads_total": "" if ok else "FAILED",
        })
    st = server.stats()
    rows.append({"phase": "final_stats", "mode": "", "requests": st.get(
        "requests_total", ""), "p50_ms": "", "p95_ms": "", "max_ms": "",
        "reload_wall_ms": "", "reloads_total": st.get("reloads_total", "")})

    out_csv = Path("/tmp/hot_reload_smoke.csv") if smoke else OUT_CSV
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    fields = ["phase", "mode", "requests", "p50_ms", "p95_ms", "max_ms",
              "reload_wall_ms", "reloads_total"]
    with out_csv.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    for r in rows:
        print(r, flush=True)
    print(f"wrote {out_csv}", flush=True)


if __name__ == "__main__":
    main()
