"""Action server round-trip on a tiny model over a real socket."""

import threading

import numpy as np
import pytest

from blurr_tpu.serving.client import ActionClient
from blurr_tpu.serving.server import ActionServer
from tests.util import tiny_pi0_cfg


@pytest.fixture(scope="module")
def server():
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random")
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_forever, kwargs={"port": 0, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    yield srv
    srv.stop()


def test_predict_roundtrip(server):
    client = ActionClient(port=server.port)
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (60, 80, 3), np.uint8)  # off-size: resized
    actions = client.predict(image, "pick up the carrot", [0.1] * 7)
    assert actions.shape == (4, 7)
    assert np.isfinite(actions).all()
    assert (np.abs(actions) <= 1.0).all()
    # second request on the same connection (instruction cache path)
    actions2 = client.predict(image, "pick up the carrot", [0.1] * 7)
    assert actions2.shape == (4, 7)
    client.close()


def test_error_keeps_connection(server):
    client = ActionClient(port=server.port)
    with pytest.raises(RuntimeError):
        client.predict(
            np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 3  # wrong proprio dim
        )
    # connection still usable after the error
    out = client.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 7)
    assert out.shape == (4, 7)
    client.close()


def test_concurrent_clients(server):
    results = []

    def hit(i):
        c = ActionClient(port=server.port)
        out = c.predict(
            np.full((28, 28, 3), i * 10, np.uint8), f"task {i}", [0.0] * 7
        )
        results.append(out)
        c.close()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert len(results) == 4
    for r in results:
        assert r.shape == (4, 7) and np.isfinite(r).all()


@pytest.fixture(scope="module")
def batch_server():
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random", max_batch=4,
                       batch_window_ms=25.0)
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_forever, kwargs={"port": 0, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    yield srv
    srv.stop()


def test_batched_concurrent_requests(batch_server):
    """Concurrent requests are coalesced into padded power-of-2 buckets and
    each client still gets its own [horizon, action_dim] chunk."""
    results = {}

    def hit(i):
        c = ActionClient(port=batch_server.port)
        out = c.predict(
            np.full((28, 28, 3), i * 10, np.uint8), f"task {i}", [0.0] * 7
        )
        results[i] = out
        c.close()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert len(results) == 6
    for r in results.values():
        assert r.shape == (4, 7) and np.isfinite(r).all()
    # different images/instructions must NOT all map to the same actions
    flat = [tuple(np.round(r.ravel(), 5)) for r in results.values()]
    assert len(set(flat)) > 1


def test_batched_bad_request_does_not_poison_batch(batch_server):
    """A malformed request fails in its own connection; a concurrent good
    request still succeeds (validation happens before enqueue)."""
    out = {}

    def good():
        c = ActionClient(port=batch_server.port)
        out["good"] = c.predict(np.zeros((28, 28, 3), np.uint8), "g", [0.0] * 7)
        c.close()

    def bad():
        c = ActionClient(port=batch_server.port)
        try:
            c.predict(np.zeros((28, 28, 3), np.uint8), "b", [0.0] * 3)
        except RuntimeError as exc:
            out["bad"] = exc
        c.close()

    tg, tb = threading.Thread(target=good), threading.Thread(target=bad)
    tg.start(); tb.start(); tg.join(120); tb.join(120)
    assert out["good"].shape == (4, 7)
    assert isinstance(out["bad"], RuntimeError)


def test_batched_single_request_latency_path(batch_server):
    """A lone request proceeds after the batch window (no deadlock)."""
    c = ActionClient(port=batch_server.port)
    r = c.predict(np.zeros((28, 28, 3), np.uint8), "solo", [0.0] * 7)
    assert r.shape == (4, 7)
    c.close()


def test_rgba_image_rejected_per_request(batch_server):
    """Non-3-channel images fail in their own connection (validated before
    enqueue) instead of poisoning a batch."""
    c = ActionClient(port=batch_server.port)
    with pytest.raises(RuntimeError):
        c.predict(np.zeros((28, 28, 4), np.uint8), "rgba", [0.0] * 7)
    out = c.predict(np.zeros((28, 28, 3), np.uint8), "ok", [0.0] * 7)
    assert out.shape == (4, 7)
    c.close()


def test_warmup_compiles_all_buckets():
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random", max_batch=4)
    secs = srv.warmup()
    assert secs > 0
    srv.stop()


def test_bucket_mode_max_pads_every_batch_to_max():
    """bucket_mode='max' runs ONE program shape: a single live request is
    padded to max_batch (one resident temp arena — the HBM-tight serving
    mode, docs/results/openvla_serving_memory_v5e.csv), and the result is
    still a correct per-request chunk."""
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random", max_batch=4,
                       batch_window_ms=5.0, bucket_mode="max")
    assert srv.warmup() > 0
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_forever, kwargs={"port": 0, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    try:
        client = ActionClient(port=srv.port)
        out = client.predict(
            np.zeros((28, 28, 3), np.uint8), "solo request", [0.0] * 7
        )
        assert out.shape == (4, 7) and np.isfinite(out).all()
        stats = client.stats()
        assert stats["bucket_mode"] == "max"
        # every batch occupies max_batch slots: live + padded ≡ 0 (mod 4)
        total_slots = stats["live_slots_total"] + stats["padded_slots_total"]
        assert total_slots == stats["batches_total"] * 4
        assert stats["live_slots_total"] >= 1
        client.close()
    finally:
        srv.stop()


def test_bucket_mode_rejected_when_unknown():
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    with pytest.raises(ValueError, match="bucket_mode"):
        ActionServer(cfg, checkpoint_path="random", max_batch=2,
                     bucket_mode="pow3")


def test_bucket_mode_max_rejects_indivisible_dp():
    """bucket_mode='max' pads every batch to max_batch and device_puts it to
    the 'data'-sharded layout; a max_batch that doesn't divide across dp
    replicas must fail LOUDLY at construction, not with an opaque sharding
    error at warmup (pow2 buckets always divide: powers of 2 >= dp)."""
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    with pytest.raises(ValueError, match="divisible by dp"):
        ActionServer(cfg, checkpoint_path="random", max_batch=5, dp=2,
                     bucket_mode="max")


def test_baseline_preset_serves_naive_path():
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    cfg["use_prefix_kv_cache"] = False
    srv = ActionServer(cfg, checkpoint_path="random")
    out = srv.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 7)
    assert out.shape == (4, 7)
    srv.stop()


def test_stop_with_inflight_requests_does_not_hang():
    """stop()'s shutdown sentinel must not be co-batched with live requests
    (it used to crash the batcher thread and hang every waiter)."""
    import time as _time

    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random", max_batch=4,
                       batch_window_ms=200.0)
    srv.warmup()
    results = {}

    def hit():
        results["out"] = srv.predict(
            np.zeros((28, 28, 3), np.uint8), "inflight", [0.0] * 7
        )

    t = threading.Thread(target=hit, daemon=True)
    t.start()
    _time.sleep(0.05)  # request is inside the 200ms batch window
    srv.stop()         # sentinel lands mid-collection
    t.join(60)
    assert not t.is_alive(), "in-flight request hung after stop()"
    assert results["out"].shape == (4, 7)


def test_predict_after_stop_raises_not_hangs():
    """A predict() issued after stop() must fail fast: the batcher thread is
    gone, so without the closed-flag/liveness checks the client would block
    on its event forever."""
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random", max_batch=4,
                       batch_window_ms=10.0)
    srv.warmup()
    srv.stop()
    with pytest.raises(RuntimeError, match="shut down"):
        srv.predict(np.zeros((28, 28, 3), np.uint8), "late", [0.0] * 7)


# ---------------------------------------------------------------------------
# tensor-parallel serving (tp > 1): the capacity path over a (1, tp) mesh


def _tp_cfg():
    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    return cfg


def _request(seed=0):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 256, (28, 28, 3), np.uint8)
    return image, "pick up the carrot", [0.1] * 7


def test_tp2_matches_single_device():
    """TP=2 sharded serving returns the same actions as the unsharded server
    (partitionable threefry keeps the in-graph noise identical; GSPMD only
    changes the reduction order)."""
    cfg = _tp_cfg()
    srv1 = ActionServer(cfg, checkpoint_path="random", seed=7)
    srv2 = ActionServer(cfg, checkpoint_path="random", seed=7, tp=2)
    img, instr, prop = _request()
    a1 = srv1.predict(img, instr, prop)
    a2 = srv2.predict(img, instr, prop)
    np.testing.assert_allclose(a2, a1, rtol=5e-4, atol=5e-5)
    srv1.stop()
    srv2.stop()


def test_tp2_w8a8_quantized():
    """TP composes with the w8a8 quant dicts ({'q8a','s'} leaves): the mesh
    rules shard q8a like the fp weight and s on the output channel."""
    cfg = _tp_cfg()
    cfg["vlm_quantization"] = {"mode": "w8a8"}
    srv1 = ActionServer(cfg, checkpoint_path="random", seed=7)
    srv2 = ActionServer(cfg, checkpoint_path="random", seed=7, tp=2)
    img, instr, prop = _request()
    a1 = srv1.predict(img, instr, prop)
    a2 = srv2.predict(img, instr, prop)
    np.testing.assert_allclose(a2, a1, rtol=5e-4, atol=5e-4)
    srv1.stop()
    srv2.stop()


def test_tp2_with_dynamic_batching():
    """tp=2 composes with max_batch>1 (batched bucket program over the mesh)."""
    cfg = _tp_cfg()
    srv = ActionServer(cfg, checkpoint_path="random", seed=7, tp=2,
                       max_batch=2, batch_window_ms=50.0)
    srv.warmup()
    img, instr, prop = _request()
    outs = {}

    def hit(i):
        outs[i] = srv.predict(img, instr, prop)

    ts = [threading.Thread(target=hit, args=(i,), daemon=True) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    assert outs[0].shape == (4, 7) and outs[1].shape == (4, 7)
    assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
    srv.stop()


def test_tp_w4a8_serves_and_matches_tp1():
    """w4a8 x tp>1 is supported (round-4 verdict Next #3): shard_params
    repacks the block-major int4 layout per the 'model' axis; the sharded
    Pi-0 server's actions equal the single-chip w4a8 server's."""
    cfg = _tp_cfg()
    cfg["vlm_quantization"] = {"mode": "w4a8"}
    img = np.zeros((28, 28, 3), np.uint8)
    srv1 = ActionServer(cfg, checkpoint_path="random")
    a1 = srv1.predict(img, "pick up the fork", [0.0] * 7)
    srv1.stop()
    srv2 = ActionServer(cfg, checkpoint_path="random", tp=2)
    a2 = srv2.predict(img, "pick up the fork", [0.0] * 7)
    srv2.stop()
    np.testing.assert_allclose(a2, a1, rtol=2e-4, atol=2e-5)


def test_invalid_json_gets_error_reply_and_connection_survives(server):
    """A well-framed but non-JSON payload must produce an {'error': ...}
    reply (not a dead handler thread), and the SAME connection must then
    serve a valid request."""
    import socket
    import struct

    from blurr_tpu.serving.server import recv_msg, send_msg

    sock = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    try:
        bad = b"\x00not json"
        sock.sendall(struct.pack(">I", len(bad)) + bad)
        resp = recv_msg(sock)
        assert "error" in resp and "ProtocolError" in resp["error"]

        import base64

        img = np.zeros((8, 8, 3), np.uint8)
        send_msg(sock, {
            "image": base64.b64encode(img.tobytes()).decode(),
            "image_shape": list(img.shape),
            "instruction": "pick",
            "proprio": [0.0] * 7,
        })
        resp = recv_msg(sock)
        assert "actions" in resp
    finally:
        sock.close()


def test_oversized_frame_gets_error_then_close(server):
    """A hostile length prefix is answered with an error and the connection
    is dropped (framing is unrecoverable)."""
    import socket
    import struct

    from blurr_tpu.serving.server import MAX_MSG_BYTES, recv_msg

    sock = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    try:
        sock.sendall(struct.pack(">I", MAX_MSG_BYTES + 1))
        resp = recv_msg(sock)
        assert resp is not None and "ProtocolError" in resp.get("error", "")
        assert recv_msg(sock) is None  # server closed the connection
    finally:
        sock.close()


def _run_direct_batch(srv, requests):
    """Drive one dynamic batch deterministically (no batcher-thread racing):
    same code path as live traffic, but the batch composition is exact."""
    from blurr_tpu.serving.server import _PendingRequest

    pend = [_PendingRequest(srv._prepare(*r)) for r in requests]
    srv._run_batch(pend)
    for p in pend:
        if p.error is not None:
            raise p.error
    return [p.result for p in pend]


def test_dp2_matches_single_device_batch():
    """dp=2 serving splits the batch bucket over the 'data' axis and returns
    the SAME actions as a one-chip server serving the same bucket
    (partitionable threefry: in-graph noise is identical under sharding)."""
    cfg = _tp_cfg()
    reqs = [_request(0), _request(1)]
    srv1 = ActionServer(cfg, checkpoint_path="random", seed=7, max_batch=2)
    srv2 = ActionServer(cfg, checkpoint_path="random", seed=7, max_batch=2,
                        dp=2)
    ref = _run_direct_batch(srv1, reqs)
    out = _run_direct_batch(srv2, reqs)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
    srv1.stop()
    srv2.stop()


def test_dp2_composes_with_tp2():
    """(dp=2, tp=2) = 4-chip serving mesh: batch split x weight split, same
    actions as the single-chip bucket."""
    cfg = _tp_cfg()
    reqs = [_request(0), _request(1)]
    srv1 = ActionServer(cfg, checkpoint_path="random", seed=7, max_batch=2)
    srv4 = ActionServer(cfg, checkpoint_path="random", seed=7, max_batch=2,
                        dp=2, tp=2)
    ref = _run_direct_batch(srv1, reqs)
    out = _run_direct_batch(srv4, reqs)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)
    srv1.stop()
    srv4.stop()


def test_dp2_live_concurrent_requests():
    """End-to-end concurrency smoke: dp=2 with the real batcher thread and
    warmup (buckets start at dp so every live bucket is mesh-divisible)."""
    cfg = _tp_cfg()
    srv = ActionServer(cfg, checkpoint_path="random", seed=7, max_batch=4,
                       batch_window_ms=50.0, dp=2)
    srv.warmup()
    outs = {}

    def hit(i):
        img, instr, prop = _request(i)
        outs[i] = srv.predict(img, instr, prop)

    ts = [threading.Thread(target=hit, args=(i,), daemon=True)
          for i in range(3)]  # odd count: pads 3 -> bucket 4, splits 2+2
    for t in ts:
        t.start()
    for t in ts:
        t.join(180)
    assert set(outs) == {0, 1, 2}
    for a in outs.values():
        assert a.shape == (4, 7) and np.isfinite(a).all()
    srv.stop()


def test_dp_requires_dynamic_batching_and_pow2():
    cfg = _tp_cfg()
    with pytest.raises(ValueError, match="max_batch"):
        ActionServer(cfg, checkpoint_path="random", dp=2)  # max_batch=1
    with pytest.raises(ValueError, match="power of 2"):
        ActionServer(cfg, checkpoint_path="random", dp=3, max_batch=6)


# ----------------------------------------------------------------------
# observability ({"kind": "stats"} protocol message)


def test_stats_endpoint_counts_and_percentiles(server):
    client = ActionClient(port=server.port)
    before = client.stats()
    img = np.zeros((28, 28, 3), np.uint8)
    client.predict(img, "stats probe", [0.0] * 7)
    client.predict(img, "stats probe", [0.0] * 7)
    after = client.stats()
    assert after["requests_total"] >= before["requests_total"] + 2
    assert after["latency_window"] >= 2
    assert after["latency_ms_p50"] <= after["latency_ms_p95"] <= after["latency_ms_p99"]
    assert after["latency_ms_p50"] > 0.0
    assert after["queue_depth"] == 0
    assert after["uptime_s"] > 0.0
    assert after["closed"] is False
    assert (after["max_batch"], after["dp"], after["tp"]) == (1, 1, 1)
    client.close()


def test_stats_counts_errors(server):
    client = ActionClient(port=server.port)
    before = client.stats()
    with pytest.raises(RuntimeError):
        client.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 3)
    after = client.stats()
    assert after["errors_total"] == before["errors_total"] + 1
    # errors are not latency samples
    assert after["latency_window"] == before["latency_window"]
    client.close()


def test_stats_batch_occupancy(batch_server):
    client = ActionClient(port=batch_server.port)
    before = client.stats()
    img = np.zeros((28, 28, 3), np.uint8)
    results = {}

    def hit(i):
        c = ActionClient(port=batch_server.port)
        results[i] = c.predict(img, f"occupancy {i}", [0.0] * 7)
        c.close()

    ts = [threading.Thread(target=hit, args=(i,), daemon=True) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    assert set(results) == {0, 1, 2}
    after = client.stats()
    assert after["batches_total"] > before.get("batches_total", 0)
    assert after["batch_occupancy_mean"] >= 1.0
    assert 0.0 <= after["padding_frac"] < 1.0
    client.close()


def test_unknown_kind_keeps_connection(server):
    from blurr_tpu.serving.server import recv_msg, send_msg

    client = ActionClient(port=server.port)
    send_msg(client.sock, {"kind": "nonsense"})
    resp = recv_msg(client.sock)
    assert "error" in resp and "nonsense" in resp["error"]
    # connection still serves stats and predicts
    assert "requests_total" in client.stats()
    out = client.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 7)
    assert out.shape == (4, 7)
    client.close()


def test_non_dict_json_frame_keeps_connection(server):
    """Valid JSON that is not an object ('[1,2]') must get an error reply,
    not kill the handler thread (hostile-input containment)."""
    from blurr_tpu.serving.server import recv_msg, send_msg

    client = ActionClient(port=server.port)
    import json as _json
    import struct as _struct

    for payload in (b"[1,2]", b'"x"'):
        client.sock.sendall(_struct.pack(">I", len(payload)) + payload)
        resp = recv_msg(client.sock)
        assert "error" in resp and "JSON object" in resp["error"]
    # connection still serves
    out = client.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 7)
    assert out.shape == (4, 7)
    client.close()


def test_max_queue_backpressure():
    """With the batcher stalled, requests beyond max_queue are rejected
    immediately with an Overloaded error (and counted in rejected_total)
    instead of accumulating unbounded latency; queued requests still
    complete once the batcher resumes."""
    import time

    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random", max_batch=2,
                       batch_window_ms=5.0, max_queue=1)
    gate = threading.Event()
    claimed = threading.Event()
    orig_run = srv._run_batch

    def gated_run(batch):
        claimed.set()
        gate.wait(60)
        orig_run(batch)

    srv._run_batch = gated_run
    img = np.zeros((28, 28, 3), np.uint8)
    results, errors = {}, {}

    def hit(i):
        try:
            results[i] = srv.predict(img, f"bp {i}", [0.0] * 7)
        except RuntimeError as e:
            errors[i] = str(e)

    # one request gets CLAIMED (the batcher then blocks inside gated_run —
    # claimed.set() proves it, so it cannot claim anything further), one
    # more fills the queue to max_queue; the next must be rejected at
    # admission. Sequencing on the claimed event is what makes this
    # deterministic: racing three submissions against the batch window let
    # the queue transiently hold 1 (rejecting a request) and then drain to
    # 0 before the old qsize poll ever saw it.
    ts = [threading.Thread(target=hit, args=(i,), daemon=True)
          for i in range(2)]
    ts[0].start()
    assert claimed.wait(30), "batcher never claimed the first request"
    ts[1].start()
    deadline = time.time() + 30
    while srv._queue.qsize() < 1 and time.time() < deadline:
        time.sleep(0.01)
    assert srv._queue.qsize() >= 1
    with pytest.raises(RuntimeError, match="Overloaded"):
        srv.predict(img, "bp overflow", [0.0] * 7)
    assert srv.stats()["rejected_total"] == 1
    gate.set()
    for t in ts:
        t.join(120)
    assert len(results) == 2 and len(errors) == 0
    for a in results.values():
        assert a.shape == (4, 7)
    srv.stop()


def test_wire_protocol_fuzz_never_kills_server(server):
    """Hostile frames — random bytes, truncated frames, huge length
    prefixes, valid-JSON non-objects, garbage kinds — must never take the
    daemon down: every NEW connection afterwards still serves."""
    import socket as _socket
    import struct as _struct

    rng = np.random.RandomState(0)
    for trial in range(12):
        s = _socket.create_connection(("127.0.0.1", server.port), timeout=30)
        try:
            kind = trial % 6
            if kind == 0:    # random bytes in a well-framed payload
                payload = rng.bytes(rng.randint(1, 200))
                s.sendall(_struct.pack(">I", len(payload)) + payload)
            elif kind == 1:  # truncated frame: length promises more
                s.sendall(_struct.pack(">I", 1000) + b"x" * 10)
            elif kind == 2:  # hostile length prefix (would be 1 GiB)
                s.sendall(_struct.pack(">I", 1 << 30))
            elif kind == 3:  # valid JSON, not an object
                payload = b"[1, 2, 3]"
                s.sendall(_struct.pack(">I", len(payload)) + payload)
            elif kind == 4:  # object with an unknown kind
                payload = b'{"kind": "exploit"}'
                s.sendall(_struct.pack(">I", len(payload)) + payload)
            else:            # predict with garbage fields
                payload = b'{"instruction": 5, "image": 3, "image_shape": "x", "proprio": null}'
                s.sendall(_struct.pack(">I", len(payload)) + payload)
        finally:
            s.close()
    with ActionClient(port=server.port) as c:
        out = c.predict(np.zeros((28, 28, 3), np.uint8), "x", [0.0] * 7)
        assert out.shape == (4, 7)
        assert c.stats()["closed"] is False


def _hostile_frames(port, rounds, rng):
    """One hostile connection per round: garbage frame kinds from the fuzz
    vocabulary plus disconnects mid-frame and mid-request."""
    import base64 as _b64
    import socket as _socket
    import struct as _struct

    img = np.zeros((28, 28, 3), np.uint8)
    valid = (
        b'{"image": "' + _b64.b64encode(img.tobytes()) + b'", '
        b'"image_shape": [28, 28, 3], "instruction": "x", '
        b'"proprio": [0, 0, 0, 0, 0, 0, 0]}'
    )
    for trial in range(rounds):
        try:
            s = _socket.create_connection(("127.0.0.1", port), timeout=30)
        except OSError:
            continue
        try:
            kind = trial % 5
            if kind == 0:    # valid request, disconnect before the reply
                s.sendall(_struct.pack(">I", len(valid)) + valid)
            elif kind == 1:  # disconnect mid-frame (half the payload)
                s.sendall(_struct.pack(">I", len(valid)) + valid[: len(valid) // 2])
            elif kind == 2:  # random bytes in a well-framed payload
                payload = rng.bytes(rng.randint(1, 200))
                s.sendall(_struct.pack(">I", len(payload)) + payload)
            elif kind == 3:  # hostile length prefix
                s.sendall(_struct.pack(">I", 1 << 30))
            else:            # bare header, nothing else
                s.sendall(b"\x00\x00")
        except OSError:
            pass
        finally:
            s.close()


def test_disconnect_midrequest_never_wedges_batcher(batch_server):
    """A client that enqueues a valid request and vanishes before reading
    the reply must not wedge the dynamic batcher: co-batched and subsequent
    requests still complete (verdict r3 Next #7)."""
    import base64 as _b64
    import socket as _socket
    import struct as _struct

    img = np.zeros((28, 28, 3), np.uint8)
    payload = (
        b'{"image": "' + _b64.b64encode(img.tobytes()) + b'", '
        b'"image_shape": [28, 28, 3], "instruction": "ghost", '
        b'"proprio": [0, 0, 0, 0, 0, 0, 0]}'
    )
    results = {}

    def ghost():
        s = _socket.create_connection(("127.0.0.1", batch_server.port),
                                      timeout=30)
        s.sendall(_struct.pack(">I", len(payload)) + payload)
        s.close()  # gone before the batch even runs

    def live(i):
        with ActionClient(port=batch_server.port) as c:
            results[i] = c.predict(
                np.full((28, 28, 3), i, np.uint8), f"live {i}", [0.0] * 7)

    ts = [threading.Thread(target=ghost)] + [
        threading.Thread(target=live, args=(i,)) for i in range(3)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    assert sorted(results) == [0, 1, 2]
    for r in results.values():
        assert r.shape == (4, 7) and np.isfinite(r).all()
    # the batcher thread is still draining: one more round works
    with ActionClient(port=batch_server.port) as c:
        out = c.predict(img, "after", [0.0] * 7)
        assert out.shape == (4, 7)


def test_chaos_under_concurrent_load_batcher_survives(batch_server):
    """Hostile frames (garbage, truncations, mid-request disconnects)
    interleaved with live batched traffic: every live request completes,
    the queue drains, and the server keeps serving (verdict r3 Next #7)."""
    rng = np.random.RandomState(7)
    ok = []
    fails = []

    def live(i):
        try:
            with ActionClient(port=batch_server.port) as c:
                for j in range(6):
                    out = c.predict(
                        np.full((28, 28, 3), (i * 7 + j) % 255, np.uint8),
                        f"load {i}", [0.0] * 7)
                    assert out.shape == (4, 7)
                ok.append(i)
        except Exception as exc:  # noqa: BLE001
            fails.append((i, exc))

    hostile = threading.Thread(
        target=_hostile_frames, args=(batch_server.port, 15, rng))
    lives = [threading.Thread(target=live, args=(i,)) for i in range(3)]
    hostile.start()
    for t in lives:
        t.start()
    hostile.join(120)
    for t in lives:
        t.join(180)
    assert not fails, fails
    assert sorted(ok) == [0, 1, 2]
    stats = batch_server.stats()
    assert stats["queue_depth"] == 0
    with ActionClient(port=batch_server.port) as c:
        assert c.predict(np.zeros((28, 28, 3), np.uint8), "post", [0.0] * 7
                         ).shape == (4, 7)


def test_hot_reload_checkpoint(tmp_path):
    """{"kind": "reload"} hot-swaps weights without restart or recompile:
    post-reload predictions equal a fresh server started on the new
    checkpoint; an incompatible tree is rejected over the wire and the old
    weights keep serving; stats() reports the live checkpoint + count."""
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.pi0.checkpoint import save_params
    from blurr_tpu.models.pi0.pizero import PiZeroInference

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    model = PiZeroInference(cfg)
    ck_a, ck_b = tmp_path / "ck_a", tmp_path / "ck_b"
    for seed, path in ((1, ck_a), (2, ck_b)):
        p = model.tie_action_proprio_weights(
            model.init_params(jax.random.PRNGKey(seed), jnp.float32))
        save_params(p, str(path))

    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (28, 28, 3), np.uint8)

    # noise derives from (base_key, request_idx): the fresh reference
    # server must be queried at the SAME request indices (0, 1, 2) the
    # reloaded server will be at
    srv_b = ActionServer(cfg, checkpoint_path=str(ck_b), seed=7)
    want_b = [srv_b.predict(image, "pick up the carrot", [0.1] * 7)
              for _ in range(3)]
    srv_b.stop()

    srv = ActionServer(cfg, checkpoint_path=str(ck_a), seed=7)
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_forever, kwargs={"port": 0, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    try:
        client = ActionClient(port=srv.port)
        before = client.predict(image, "pick up the carrot", [0.1] * 7)
        assert not np.array_equal(before, want_b[0])  # different weights

        resp = client.reload(str(ck_b))
        assert resp["reloaded"] == str(ck_b)
        after = client.predict(image, "pick up the carrot", [0.1] * 7)
        np.testing.assert_array_equal(after, want_b[1])  # == fresh server on B

        st = client.stats()
        assert st["reloads_total"] == 1 and st["checkpoint"] == str(ck_b)

        # incompatible tree (different dims) is rejected; old weights live on
        bad_cfg = tiny_pi0_cfg()
        bad_cfg.image_token_index = 257152
        bad_cfg.vocab_size = 258000
        bad_cfg.pretrained_model_path = "(stub)"
        bad_cfg.max_seq_len = bad_cfg.max_image_text_tokens
        bad_cfg.action_dim = 5  # changes the action projection shapes
        bad_model = PiZeroInference(bad_cfg)
        bad = tmp_path / "bad"
        save_params(bad_model.tie_action_proprio_weights(
            bad_model.init_params(jax.random.PRNGKey(3), jnp.float32)),
            str(bad))
        with pytest.raises(RuntimeError, match="incompatible"):
            client.reload(str(bad))
        still = client.predict(image, "pick up the carrot", [0.1] * 7)
        np.testing.assert_array_equal(still, want_b[2])
        client.close()
    finally:
        srv.stop()


def test_hot_reload_drop_first_and_failure_recovery(tmp_path):
    """drop_first=True reload (for trees too big to hold twice) frees the
    old weights before loading; a FAILED drop_first load leaves the server
    rejecting with a clear error — and a later successful reload
    recovers."""
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.pi0.checkpoint import save_params
    from blurr_tpu.models.pi0.pizero import PiZeroInference

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    model = PiZeroInference(cfg)
    ck = tmp_path / "ck"
    save_params(model.tie_action_proprio_weights(
        model.init_params(jax.random.PRNGKey(4), jnp.float32)), str(ck))

    srv = ActionServer(cfg, checkpoint_path="random")
    image = np.zeros((28, 28, 3), np.uint8)
    assert srv.reload_checkpoint(str(ck), drop_first=True)["drop_first"]
    out = srv.predict(image, "after drop-first reload", [0.0] * 7)
    assert out.shape == (4, 7)

    with pytest.raises(Exception):
        srv.reload_checkpoint(str(tmp_path / "missing"), drop_first=True)
    with pytest.raises(RuntimeError, match="no weights"):
        srv.predict(image, "server has no weights", [0.0] * 7)
    assert "FAILED" in srv.stats()["checkpoint"]

    srv.reload_checkpoint(str(ck), drop_first=True)  # recovery path
    out = srv.predict(image, "recovered", [0.0] * 7)
    assert out.shape == (4, 7)

    # a PLAIN atomic reload must also recover from params=None (no live
    # tree to structurally compare against — rebinds directly)
    with pytest.raises(Exception):
        srv.reload_checkpoint(str(tmp_path / "missing"), drop_first=True)
    resp = srv.reload_checkpoint(str(ck))  # default atomic mode
    assert resp["drop_first"] is False
    out = srv.predict(image, "recovered atomically", [0.0] * 7)
    assert out.shape == (4, 7)
    srv.stop()


def test_hot_reload_drop_first_stalls_inflight_requests():
    """Requests racing a drop_first reload STALL on the device lock until
    the new weights land (the documented semantics) — they must not observe
    the transient params=None and error (regression: the None check used to
    run outside the lock)."""
    import time

    cfg = tiny_pi0_cfg()
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg.pretrained_model_path = "(stub)"
    cfg.max_seq_len = cfg.max_image_text_tokens
    srv = ActionServer(cfg, checkpoint_path="random")
    image = np.zeros((28, 28, 3), np.uint8)
    srv.predict(image, "warm", [0.0] * 7)

    orig_build = srv._build_params
    in_reload = threading.Event()

    def slow_build(path):
        in_reload.set()
        time.sleep(0.8)  # window where params is None and the lock is held
        return orig_build(path)

    srv._build_params = slow_build
    results, errors = [], []

    def rel():
        try:
            srv.reload_checkpoint("random", drop_first=True)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def req():
        try:
            results.append(srv.predict(image, "during reload", [0.0] * 7))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    rt = threading.Thread(target=rel)
    rt.start()
    assert in_reload.wait(10)
    qt = threading.Thread(target=req)
    qt.start()
    rt.join(60)
    qt.join(60)
    assert not errors, errors
    assert len(results) == 1 and results[0].shape == (4, 7)
    assert srv.stats()["reloads_total"] == 1
    srv.stop()


def test_serve_ctl_cli(server, capsys, monkeypatch):
    """scripts/serve_ctl.py drives stats + reload over the wire and prints
    the server's JSON response (the ops surface for a running daemon)."""
    import importlib
    import json
    from pathlib import Path

    monkeypatch.syspath_prepend(str(Path(__file__).resolve().parents[1] / "scripts"))
    ctl = importlib.import_module("serve_ctl")

    ctl.main(["stats", "--port", str(server.port)])
    st = json.loads(capsys.readouterr().out)
    assert st["errors_total"] >= 0 and "checkpoint" in st

    ctl.main(["reload", "random", "--port", str(server.port)])
    resp = json.loads(capsys.readouterr().out)
    assert resp["reloaded"] == "random" and resp["drop_first"] is False

    ctl.main(["stats", "--port", str(server.port)])
    st2 = json.loads(capsys.readouterr().out)
    assert st2["reloads_total"] >= st.get("reloads_total", 0) + 1
