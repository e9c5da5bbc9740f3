"""Server-level SLO for the OpenVLA-family action server on the real chip.

Companion to experiments/serving_slo.py (Pi-0): drives the ACTUAL TCP
server + dynamic batcher (blurr_tpu/serving/openvla_server.py, the
scripts/serve_openvla.py daemon) with N concurrent closed-loop clients and
reports client-observed p50/p95/p99 latency and aggregate actions/s. The
benchmark-level numbers live in scripts/benchmark_hf_vla.py; this measures
what a robot fleet actually sees — batching-window delay, ragged-prompt
padding, pickle/socket overhead, greedy-decode serialization.

Writes docs/results/serving_openvla_slo_v5e.csv. Run on the v5e;
the 7B wants bf16 (random-7b) and takes several minutes of warmup
compiles. Note (CLAUDE.md): tunnel RTT dominates absolute numbers in this
dev container and drifts run-to-run — re-sweep whole tables in one
process, compare shapes not absolutes.
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

from blurr_tpu.serving.server import recv_msg, send_msg

# model_id -> (quantization, max_batch, client sweep). Measured capacity
# ceilings (experiments/openvla_serving_memory.py AOT buffer-assignment
# probe + on-chip OOMs, 2026-08-19, docs/results/openvla_serving_memory_
# v5e.csv): the 7B bf16 step fits ONLY at batch 1 (14.13 GB peak; batch 2
# compile-OOMs), so bf16 is a batch-1 tier — extra clients measure queueing.
# w8a8's per-program peaks fit through batch 16 (13.4 GB), but warmup
# compiles EVERY bucket and the axon runtime holds each loaded executable's
# temp arena: weights 7.8 GB + cumulative bucket temps (0.3+1.9+2.7+4.4)
# exceed 15.75 GB at max_batch=8 (the measured RESOURCE_EXHAUSTED) —
# max_batch=4 keeps the cumulative footprint at 12.7 GB. w4a8 (4.8 GB
# weights) has the most headroom; w8a8 is the serving-grade 7B preset.
PRESETS = {
    # (model_id, quantization, max_batch, client sweep, bucket_mode, decode)
    "openvla7b_bf16": ("random-7b", None, 1, [1, 2], "pow2", "ar"),
    "openvla7b_w8a8": ("random-7b", "w8a8", 4, [1, 2, 4], "pow2", "ar"),
    # bucket_mode='max' holds ONE compiled program (one resident temp
    # arena), which is exactly what lets w8a8 serve max_batch=8 without
    # the cumulative-bucket OOM the pow2 preset dodges by halving capacity
    "openvla7b_w8a8_max8": ("random-7b", "w8a8", 8, [1, 4, 8], "max", "ar"),
    "minivla_bf16": ("random-minivla", None, 8, [1, 4, 8], "pow2", "ar"),
    # Jacobi decode behind the SAME dynamic batcher (round-4 verdict Next
    # #1: the SERVING.md recommendation needs server-level rows, not just
    # benchmark-loop numbers). The batched lax.while_loop couples
    # co-batched requests — bucket latency = MAX sweeps over the batch —
    # so the multi-client rows price exactly that straggler coupling.
    "openvla7b_bf16_jacobi": ("random-7b", None, 1, [1, 2], "pow2",
                              "jacobi"),
    "openvla7b_w8a8_jacobi": ("random-7b", "w8a8", 4, [1, 2, 4], "pow2",
                              "jacobi"),
    "minivla_jacobi": ("random-minivla", None, 8, [1, 4, 8], "pow2",
                       "jacobi"),
    # CPU smoke preset (not part of the measured table):
    #   BLURR_PLATFORM=cpu python experiments/serving_openvla_slo.py tiny
    "tiny": ("random", None, 2, [1, 2], "pow2", "ar"),
    "tiny_jacobi": ("random", None, 2, [1, 2], "pow2", "jacobi"),
}
DURATION_S = 15.0
OUT_CSV = (Path(__file__).resolve().parents[1] / "docs" / "results"
           / "serving_openvla_slo_v5e.csv")
FIELDS = ["preset", "clients", "mode", "requests", "actions_per_s",
          "p50_ms", "p95_ms", "p99_ms", "mean_ms",
          "batch_occupancy", "padding_frac"]


def _request_payload(image_hw: int) -> dict:
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (image_hw, image_hw, 3), np.uint8)
    return {
        "instruction": "put the carrot on the plate",
        "image": base64.b64encode(img.tobytes()).decode("ascii"),
        "image_shape": list(img.shape),
        "proprio": [0.0] * 7,  # accepted and ignored (shared schema)
    }


def _client_loop(port, payload, stop_at, out, errors):
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


def run_preset(name, model_id, quantization, max_batch, sweep, rows,
               bucket_mode="pow2", decode="ar"):
    from blurr_tpu.serving.openvla_server import OpenVLAActionServer

    print(f"[{name}] building server (max_batch={max_batch}, "
          f"bucket_mode={bucket_mode}, decode={decode})...", flush=True)
    server = OpenVLAActionServer(
        model_id, quantization=quantization, max_batch=max_batch,
        bucket_mode=bucket_mode, decode=decode,
    )
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

    payload = _request_payload(int(server.spec.siglip.image_size))
    img = np.frombuffer(
        base64.b64decode(payload["image"]), np.uint8
    ).reshape(*payload["image_shape"])

    # direct predict() floor (max_batch temporarily 1: skips the batcher)
    orig = server.max_batch
    server.max_batch = 1
    try:
        lat = []
        for _ in range(30):
            t0 = time.time()
            server.predict(img, payload["instruction"], payload["proprio"])
            lat.append(time.time() - t0)
    finally:
        server.max_batch = orig
    stats = _percentiles(lat[10:])
    print(f"[{name}] direct predict() p50 {stats['p50_ms']:.1f} ms",
          flush=True)
    rows.append({"preset": name, "clients": 0, "mode": "direct_predict",
                 "requests": 20, "actions_per_s": "", **stats})

    for n in sweep:
        lat_lists = [[] for _ in range(n)]
        errors: list = []
        s0 = server.stats()
        stop_at = time.time() + DURATION_S
        threads = [
            threading.Thread(target=_client_loop,
                             args=(port, payload, stop_at, lat_lists[i],
                                   errors))
            for i in range(n)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        if errors:
            raise RuntimeError(
                f"[{name}] clients={n}: {len(errors)} client thread(s) "
                f"failed; first: {errors[0]!r}"
            )
        lat = [x for lst in lat_lists for x in lst]
        stats = _percentiles(lat)
        aps = len(lat) / wall
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
            f"{aps:7.1f} actions/s | p50 {stats['p50_ms']:.1f} "
            f"p95 {stats['p95_ms']:.1f} p99 {stats['p99_ms']:.1f} ms"
            + (f" | occ {occ} pad {pad_frac}" if occ != "" else ""),
            flush=True,
        )
        rows.append({"preset": name, "clients": n, "mode": "tcp",
                     "requests": len(lat), "actions_per_s": round(aps, 1),
                     **stats,
                     "batch_occupancy": occ, "padding_frac": pad_frac})
    server.stop()
    time.sleep(0.5)


def _run_single(name: str, out_path: Path):
    (model_id, quantization, max_batch, sweep, bucket_mode,
     decode) = PRESETS[name]
    rows: list = []
    run_preset(name, model_id, quantization, max_batch, sweep, rows,
               bucket_mode=bucket_mode, decode=decode)
    with out_path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)


def main():
    # one preset per subprocess: 7B weight trees only release at process
    # exit (same rationale as serving_slo.py — two presets in one process
    # OOM the 16 GB chip)
    import subprocess
    import tempfile

    if len(sys.argv) >= 4 and sys.argv[1] == "--single":
        _run_single(sys.argv[2], Path(sys.argv[3]))
        return

    rows: list = []
    only = set(sys.argv[1:])
    out_csv = OUT_CSV
    full = {k for k in PRESETS if not k.startswith("tiny")}
    if only and only <= {"tiny", "tiny_jacobi"}:
        # the CPU smoke must not overwrite the measured v5e table
        out_csv = Path("/tmp/serving_openvla_slo_smoke.csv")
    elif only and only != full:
        # a filtered re-measure must not truncate the full sweep's table
        out_csv = OUT_CSV.with_name(OUT_CSV.stem + "_partial.csv")
        print(f"partial sweep -> {out_csv} (merge by hand)", flush=True)
    for name in PRESETS:
        if only and name not in only:
            continue
        with tempfile.NamedTemporaryFile(suffix=".csv", delete=False) as tf:
            part = Path(tf.name)
        rc = subprocess.call(
            [sys.executable, str(Path(__file__).resolve()), "--single",
             name, str(part)]
        )
        if rc != 0:
            print(f"[{name}] FAILED (rc={rc}); keeping earlier rows",
                  flush=True)
        elif part.exists():
            with part.open() as f:
                rows.extend(list(csv.DictReader(f)))
        part.unlink(missing_ok=True)
        out_csv.parent.mkdir(parents=True, exist_ok=True)
        with out_csv.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=FIELDS)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {out_csv} ({len(rows)} rows)", flush=True)


if __name__ == "__main__":
    main()
