"""Server-level SLO measurement on the real chip (verdict Next #6).

The README's 122→590 chunks/s ladder is benchmark-level (benchmark_pi0.py
--batch-size N). This drives the ACTUAL TCP server + dynamic batcher
(blurr_tpu/serving/server.py, the scripts/serve_pi0.py daemon) with N
concurrent closed-loop clients and reports client-observed p50/p95/p99
latency and aggregate chunks/s — including the batching-window delay,
pickle/socket overhead (vs a direct predict() loop), and bucket-padding cost
(N=5 rides the 8-bucket).

Writes docs/results/serving_slo_v5e.csv. Run on the v5e; ~8-12 min
(bucket warmup compiles dominate).
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
from blurr_tpu.serving.server import ActionServer, recv_msg, send_msg

# preset -> (yaml, max_batch, client sweep). bf16 full dims caps at batch 8
# (batch 16 OOMs the 16 GB chip: 7 GB weights + 276-token batch-16
# activations); the int8 pool64 preset rides to 16.
PRESETS = {
    "bf16_step1": (
        "config/eval/bridge_step1.yaml", 8, [1, 4, 5, 8],
    ),
    "pool64_w8a8_step1": (
        "config/eval/bridge_pool64_w8a8_steps1.yaml", 16, [1, 4, 5, 8, 16],
    ),
}
DURATION_S = 15.0
OUT_CSV = Path(__file__).resolve().parents[1] / "docs" / "results" / "serving_slo_v5e.csv"


def _request_payload(image_hw: int, proprio_dim: int) -> dict:
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (image_hw, image_hw, 3), np.uint8)
    return {
        "instruction": "put the carrot on the plate",
        "image": base64.b64encode(img.tobytes()).decode("ascii"),
        "image_shape": list(img.shape),
        "proprio": [0.0] * proprio_dim,
    }


def _client_loop(port: int, payload: dict, stop_at: float, out: list,
                 errors: list):
    """A failure lands in ``errors`` — a silently-dead client thread would
    otherwise shrink the effective concurrency and misreport the sweep point
    as healthy at a lower load."""
    try:
        sock = socket.create_connection(("127.0.0.1", port))
        try:
            while time.time() < stop_at:
                t0 = time.time()
                send_msg(sock, payload)
                resp = recv_msg(sock)
                dt = time.time() - t0
                assert resp is not None and "actions" in resp, resp
                out.append(dt)
        finally:
            sock.close()
    except BaseException as exc:  # noqa: BLE001 — recorded, re-raised by parent
        errors.append(exc)


def _percentiles(lat):
    lat = np.sort(np.asarray(lat))
    return {
        "p50_ms": float(np.percentile(lat, 50) * 1000),
        "p95_ms": float(np.percentile(lat, 95) * 1000),
        "p99_ms": float(np.percentile(lat, 99) * 1000),
        "mean_ms": float(lat.mean() * 1000),
    }


def run_preset(name: str, cfg_path: str, max_batch: int, sweep: list, rows: list):
    cfg = load_cfg(cfg_path)
    # bridge_step1.yaml inherits bridge.yaml's use_bf16: False (reference
    # parity default); the blurr preset semantics set bf16 at the CLI level.
    # Without this the server builds 13.2 GB fp32 weights and batch>=2 OOMs.
    cfg["use_bf16"] = True
    print(f"[{name}] building server (max_batch={max_batch})...", flush=True)
    server = ActionServer(cfg, "random", max_batch=max_batch)
    t_warm = server.warmup()
    print(f"[{name}] warmup (all buckets compiled): {t_warm:.1f}s", flush=True)

    ready = threading.Event()
    st = threading.Thread(
        target=server.serve_forever,
        kwargs={"host": "127.0.0.1", "port": 0, "ready_event": ready},
        daemon=True,
    )
    st.start()
    ready.wait(10)
    port = server.port

    img_hw = int(cfg["vision"]["config"]["image_size"])
    payload = _request_payload(img_hw, int(cfg["proprio_dim"]))

    # per-request floors (no socket). Two modes:
    #   direct_predict — the single-request FAST PATH (max_batch temporarily
    #     1 so predict() skips the queue entirely): device + preprocessing
    #     only. With max_batch>1 predict() routes through the batcher and
    #     its ~2ms collection window, which is NOT a floor.
    #   queued_predict — predict() through the batcher at the preset's
    #     max_batch: (queued - direct) isolates the queue+window overhead a
    #     single request pays for dynamic batching.
    img = np.frombuffer(base64.b64decode(payload["image"]), np.uint8).reshape(
        img_hw, img_hw, 3
    )

    def _predict_loop(iters=40, drop=10):
        lat = []
        for _ in range(iters):
            t0 = time.time()
            server.predict(img, payload["instruction"], payload["proprio"])
            lat.append(time.time() - t0)
        return _percentiles(lat[drop:]), iters - drop

    orig_max_batch = server.max_batch
    server.max_batch = 1  # predict() takes the direct branch; batcher idles
    try:
        direct_stats, n_direct = _predict_loop()
    finally:
        server.max_batch = orig_max_batch
    print(f"[{name}] direct predict() p50 {direct_stats['p50_ms']:.1f} ms", flush=True)
    rows.append({"preset": name, "clients": 0, "mode": "direct_predict",
                 "requests": n_direct, "chunks_per_s": "", **direct_stats})
    if orig_max_batch > 1:
        queued_stats, n_queued = _predict_loop()
        print(
            f"[{name}] queued predict() p50 {queued_stats['p50_ms']:.1f} ms "
            f"(batching overhead "
            f"{queued_stats['p50_ms'] - direct_stats['p50_ms']:.1f} ms)",
            flush=True,
        )
        rows.append({"preset": name, "clients": 0, "mode": "queued_predict",
                     "requests": n_queued, "chunks_per_s": "", **queued_stats})

    for n in sweep:
        lat_lists = [[] for _ in range(n)]
        errors: list = []
        s0 = server.stats()
        stop_at = time.time() + DURATION_S
        threads = [
            threading.Thread(
                target=_client_loop,
                args=(port, payload, stop_at, lat_lists[i], errors),
            )
            for i in range(n)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        if errors:
            # a dead client shrinks the effective concurrency — the sweep
            # point is invalid, not "healthy at lower load"
            raise RuntimeError(
                f"[{name}] clients={n}: {len(errors)} client thread(s) "
                f"failed; first: {errors[0]!r}"
            )
        lat = [x for lst in lat_lists for x in lst]
        stats = _percentiles(lat)
        chunks_per_s = len(lat) / wall
        # server-side batching efficiency for THIS sweep point (counter
        # diff across the {"kind": "stats"} snapshots)
        s1 = server.stats()
        d_batches = s1.get("batches_total", 0) - s0.get("batches_total", 0)
        d_live = (s1.get("live_slots_total", 0)
                  - s0.get("live_slots_total", 0))
        d_pad = (s1.get("padded_slots_total", 0)
                 - s0.get("padded_slots_total", 0))
        occ = round(d_live / d_batches, 2) if d_batches else ""
        pad_frac = (round(d_pad / (d_live + d_pad), 4)
                    if (d_live + d_pad) else "")
        print(
            f"[{name}] clients={n:2d}: {len(lat):5d} req in {wall:.1f}s = "
            f"{chunks_per_s:7.1f} chunks/s | p50 {stats['p50_ms']:.1f} "
            f"p95 {stats['p95_ms']:.1f} p99 {stats['p99_ms']:.1f} ms"
            + (f" | occ {occ} pad {pad_frac}" if occ != "" else ""),
            flush=True,
        )
        rows.append({"preset": name, "clients": n, "mode": "tcp",
                     "requests": len(lat),
                     "chunks_per_s": round(chunks_per_s, 1), **stats,
                     "batch_occupancy": occ, "padding_frac": pad_frac})

    server.stop()
    time.sleep(0.5)


def measure_rtt_floor() -> float:
    """Per-call dispatch+fetch floor of this environment: one trivial device
    program, timed per synchronous call. Over the axon dev tunnel this is
    tens of ms of HTTP RTT; on a host-attached TPU it is sub-ms — subtract it
    to project production SLOs."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))  # compile
    t = []
    for _ in range(30):
        t0 = time.time()
        np.asarray(f(x))
        t.append(time.time() - t0)
    return float(np.median(t) * 1000)


FIELDS = ["preset", "clients", "mode", "requests", "chunks_per_s",
          "p50_ms", "p95_ms", "p99_ms", "mean_ms",
          "batch_occupancy", "padding_frac"]


def _flush_csv(rows):
    OUT_CSV.parent.mkdir(parents=True, exist_ok=True)
    with OUT_CSV.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT_CSV} ({len(rows)} rows)", flush=True)


def _run_single(name: str, out_path: Path):
    """Child-process entry: measure ONE preset, write its rows to out_path."""
    cfg_path, max_batch, sweep = PRESETS[name]
    rows: list = []
    run_preset(name, cfg_path, max_batch, sweep, rows)
    with out_path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)


def main():
    # Each preset runs in its OWN subprocess: a served 3B model is ~7 GB of
    # bf16 weights, and the serve_forever daemon thread keeps them alive past
    # server.stop() — two presets in one process OOM the 16 GB chip
    # (measured). Process exit is the only airtight release.
    import subprocess
    import tempfile

    if len(sys.argv) >= 4 and sys.argv[1] == "--single":
        _run_single(sys.argv[2], Path(sys.argv[3]))
        return

    rows: list = []
    rtt = measure_rtt_floor()
    print(f"per-call dispatch+fetch RTT floor: {rtt:.1f} ms", flush=True)
    rows.append({"preset": "rtt_floor", "clients": 0, "mode": "trivial_program",
                 "requests": 30, "chunks_per_s": "", "p50_ms": round(rtt, 1),
                 "p95_ms": "", "p99_ms": "", "mean_ms": ""})
    only = set(sys.argv[1:])
    for name in PRESETS:
        if only and name not in only:
            continue
        with tempfile.NamedTemporaryFile(suffix=".csv", delete=False) as tf:
            part = Path(tf.name)
        rc = subprocess.call(
            [sys.executable, str(Path(__file__).resolve()), "--single", name,
             str(part)]
        )
        if rc != 0:
            print(f"[{name}] FAILED (rc={rc}); keeping earlier rows", flush=True)
        elif part.exists():
            with part.open() as f:
                rows.extend(list(csv.DictReader(f)))
        part.unlink(missing_ok=True)
        _flush_csv(rows)  # incremental: a later-preset failure keeps these rows


if __name__ == "__main__":
    main()
