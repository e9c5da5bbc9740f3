"""Action server: network serving for the VLA control step.

The reference has no serving daemon (SURVEY.md §0); this is the deployment
layer for the TPU build. One jitted control-step program serves requests
over a length-prefixed JSON protocol (arrays as base64) — dependency-free
stdlib sockets, one worker thread per connection, model execution serialized
on the device (the TPU is a single in-order stream anyway).

Protocol (both directions): 4-byte big-endian length + UTF-8 JSON.
Request:  {"instruction": str, "image": b64(u8 HxWx3 bytes), "image_shape":
           [H, W, 3], "proprio": [float, ...]}
Response: {"actions": [[...], ...], "latency_ms": float}  or {"error": str}

Observability: {"kind": "stats"} returns server-side counters — request/
error totals, p50/p95/p99 latency over a bounded window, dynamic-batch
occupancy and padding overhead, queue depth, uptime — the same quantities
docs/results/serving_slo_v5e.md measures client-side, now exported by the
daemon itself (doubles as the health-check endpoint).
"""

from __future__ import annotations

import base64
import collections
import json
import logging
import queue
import socket
import struct
import threading
import time
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


def send_msg(sock: socket.socket, obj: dict) -> None:
    data = json.dumps(obj).encode("utf-8")
    sock.sendall(struct.pack(">I", len(data)) + data)


# generous bound for a base64 camera frame + metadata; rejects hostile
# length prefixes before buffering (a 0xFFFFFFFF header would otherwise
# allocate 4 GiB per connection)
MAX_MSG_BYTES = 64 * 1024 * 1024


class ProtocolError(ValueError):
    """Malformed wire data. ``recoverable`` says whether the stream is
    still framed (bad JSON in a complete frame) or lost (oversized length
    prefix whose payload was never consumed)."""

    def __init__(self, msg: str, recoverable: bool):
        super().__init__(msg)
        self.recoverable = recoverable


def recv_msg(sock: socket.socket) -> Optional[dict]:
    header = _recv_exact(sock, 4)
    if header is None:
        return None
    (length,) = struct.unpack(">I", header)
    if length > MAX_MSG_BYTES:
        raise ProtocolError(
            f"frame length {length} exceeds MAX_MSG_BYTES={MAX_MSG_BYTES}",
            recoverable=False,
        )
    payload = _recv_exact(sock, length)
    if payload is None:
        return None
    try:
        return json.loads(payload.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        # the frame was fully consumed — the connection can keep serving
        raise ProtocolError(f"invalid JSON payload: {exc}", recoverable=True)


class _PendingRequest:
    """One enqueued request awaiting a batched device step."""

    __slots__ = ("inputs", "event", "result", "error", "claimed")

    def __init__(self, inputs):
        self.inputs = inputs
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None
        # set by the batcher the moment it dequeues the request: a claimed
        # request WILL complete (its batch is computing), so the client must
        # keep waiting even through stop(); only unclaimed requests are
        # abandoned on shutdown
        self.claimed = False


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()  # linear-time accumulate (bytes += is O(n^2))
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class ActionServer:
    """Serves Pi-0 action chunks over TCP.

    The per-request path is exactly the EvalAgent control step: adapter-style
    preprocessing (resize + tokenize with an instruction cache), one jitted
    device program, denormalization-free raw actions returned (callers apply
    their env adapter; keeps the server robot-agnostic).

    With ``max_batch > 1`` the server runs DYNAMIC BATCHING: requests that
    arrive within ``batch_window_ms`` of each other are padded to the next
    power-of-2 bucket and served by one device program (measured on v5e:
    batch 8 = 122 chunks/s bf16 vs 84/s serial). Request validation happens
    in the caller's thread, so a malformed request never fails a co-batched
    one.

    With ``tp > 1`` the server runs TENSOR-PARALLEL over a (1, tp) device
    mesh: weights (incl. int8/w8a8 quant dicts) carry the NamedSharding
    rules from ``blurr_tpu/parallel/mesh.py``, requests are replicated, and
    GSPMD inserts the ICI collectives — the capacity path for models whose
    weights exceed one chip's HBM. Composes with dynamic batching.

    With ``dp > 1`` the server runs DATA-PARALLEL over the 'data' mesh axis:
    weights replicate (or TP-shard when combined with ``tp``) and each
    dynamic batch splits over the ``dp`` chips — the THROUGHPUT path, since
    one chip's dynamic batching saturates at the compute-bound batch size
    (590 chunks/s w8a8 on one v5e, docs/results/serving_slo_v5e.md). dp must
    be a power of 2 (batch buckets stay mesh-divisible) and requires dynamic
    batching with ``max_batch >= dp``.
    """

    def __init__(self, cfg, checkpoint_path: Optional[str] = None,
                 seed: int = 42, max_batch: int = 1,
                 batch_window_ms: float = 2.0, tp: int = 1, dp: int = 1,
                 max_queue: int = 0, bucket_mode: str = "pow2"):
        import jax
        import jax.numpy as jnp

        from blurr_tpu.benchmarks import build_processor
        from blurr_tpu.models.pi0.pizero import PiZeroInference

        self.cfg = cfg
        self._init_parallel(tp, dp, max_batch)
        self.dtype = jnp.bfloat16 if cfg.get("use_bf16") else jnp.float32
        self.model = PiZeroInference(cfg)
        # w4a8 composes with tp>1: shard_params (called in _build_params)
        # repacks the block-major int4 layout per the 'model' axis and the
        # kernel's GSPMD rule column-shards it — see parallel/mesh.py and
        # ops/pallas_int4_matmul.py:int4_matmul_spmd.
        self.params = self._build_params(checkpoint_path)
        self._checkpoint_desc = str(checkpoint_path or "random")
        self.processor = build_processor(cfg)
        # noise sampled in-graph from (base_key, request_idx) — the shared
        # derivation (agent/eval_agent.py:make_noise_infer). Batch size
        # comes from the input shapes, so one jitted fn serves every batch
        # bucket (one compile per bucket).
        from blurr_tpu.agent.eval_agent import make_noise_infer

        # honor the preset semantics: baseline/vanilla presets set
        # use_prefix_kv_cache=False and must serve the naive path
        infer = (
            self.model.infer_action
            if cfg.get("use_prefix_kv_cache", True)
            else self.model.infer_action_naive
        )
        self._step = make_noise_infer(
            infer, self.model.spec.num_action_tokens,
            self.model.spec.action_dim, self.dtype,
        )
        self._init_runtime(seed, max_batch, batch_window_ms,
                           max_queue=max_queue, bucket_mode=bucket_mode)

    def _build_params(self, checkpoint_path):
        """Load → quantize → shard a ready-to-serve Pi-0 tree. Shared by
        __init__ and reload_checkpoint (hot-reload loads through exactly
        the startup path, so the two can never drift)."""
        import jax

        if (not checkpoint_path
                or str(checkpoint_path).lower() in {"random", "none"}):
            params = self.model.init_params(jax.random.PRNGKey(0), self.dtype)
            params = self.model.tie_action_proprio_weights(params)
        else:
            from blurr_tpu.models.pi0.checkpoint import (
                load_pizero_params_auto,
            )

            # torch .pt OR an orbax dir from train_pi0_flow --save-dir
            # (incl. QLoRA adapter trees — mm serves the dicts directly)
            params = load_pizero_params_auto(
                checkpoint_path, dtype=self.dtype
            )
        params = self.model.enable_action_quantization(params)
        params = self.model.enable_vlm_quantization(params)
        if self.mesh is not None:
            from blurr_tpu.parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        return params

    # ------------------------------------------------------------------
    # model-agnostic serving runtime (mesh, batcher, transport) — shared
    # with the OpenVLA family server (blurr_tpu/serving/openvla_server.py)

    def _init_parallel(self, tp: int, dp: int, max_batch: int) -> None:
        """Validate dp/tp and build the (dp, tp) mesh + placement shardings.
        ``self.mesh`` is None single-chip; a subclass shards its own params
        with it. TP is the capacity path (per-chip weight bytes / tp), DP the
        throughput path (each dynamic batch splits over 'data')."""
        self.tp = max(1, int(tp))
        self.dp = max(1, int(dp))
        self.mesh = None
        self._replicate = None
        self._batch_shard = None
        if self.dp > 1:
            if self.dp & (self.dp - 1):
                raise ValueError(
                    f"dp={self.dp}: must be a power of 2 so every "
                    "power-of-2 batch bucket >= dp splits evenly over the "
                    "'data' mesh axis"
                )
            if max_batch < self.dp:
                raise ValueError(
                    f"dp={self.dp} needs dynamic batching with max_batch >= "
                    f"dp (got max_batch={max_batch}): DP serving splits the "
                    "batch over chips"
                )
        if self.tp > 1 or self.dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            from blurr_tpu.parallel.mesh import batch_sharding, make_mesh

            self.mesh = make_mesh(data=self.dp, model=self.tp)
            # per-request tensors are replicated over the mesh (TP serving
            # keeps the batch whole); with dp > 1 the BATCHED bucket is then
            # re-committed split over 'data' in _run_batch/warmup
            self._replicate = NamedSharding(self.mesh, PartitionSpec())
            if self.dp > 1:
                self._batch_shard = batch_sharding(self.mesh)

    def _init_runtime(self, seed: int, max_batch: int,
                      batch_window_ms: float, max_queue: int = 0,
                      bucket_mode: str = "pow2") -> None:
        import jax

        self._base_key = jax.random.PRNGKey(seed)
        if self._replicate is not None:
            self._base_key = jax.device_put(self._base_key, self._replicate)
        self._req_idx = 0
        self._lock = threading.Lock()  # device stream + PRNG serialization
        self._tok_cache = {}
        self._tok_lock = threading.Lock()  # cache mutated by handler threads
        self._sock: Optional[socket.socket] = None
        # dynamic batching: concurrent requests within batch_window_ms are
        # padded to the next power-of-2 bucket and run as ONE device program
        # (padded-batch decode correctness is locked by
        # tests/test_pizero.py's padded-batch test).
        # bucket_mode "max" pads EVERY batch to max_batch instead: one
        # compiled program and ONE resident temp arena, for HBM-tight
        # models — measured on v5e (docs/results/openvla_serving_memory_
        # v5e.csv): the runtime holds every warmed bucket's temp arena, so
        # OpenVLA-7B w8a8 at max_batch=8 OOMs under pow2 (weights 7.8 GB +
        # 0.3+1.9+2.7+4.4 GB arenas) but fits under "max" (7.8 + 4.4 GB).
        # The trade is padding compute at low occupancy.
        if bucket_mode not in ("pow2", "max"):
            raise ValueError(
                f"bucket_mode {bucket_mode!r}: expected 'pow2' or 'max'"
            )
        self.bucket_mode = bucket_mode
        self.max_batch = max(1, int(max_batch))
        # "max" pads every batch to max_batch, and that bucket is device_put
        # to the 'data'-sharded layout — it must split evenly across dp
        # replicas or warmup fails with an opaque sharding error (pow2
        # buckets are powers of 2 >= dp, so they always divide).
        if self.bucket_mode == "max" and self.max_batch % max(self.dp, 1):
            raise ValueError(
                f"bucket_mode='max' pads every batch to max_batch="
                f"{self.max_batch}, which must be divisible by dp={self.dp} "
                "for the data-parallel sharding"
            )
        self.batch_window_s = batch_window_ms / 1000.0
        # backpressure: > 0 bounds the number of QUEUED (not yet claimed)
        # requests; excess requests are rejected immediately instead of
        # accumulating unbounded latency behind a saturated device. 0 =
        # admit everything (the default; robot-loop clients self-limit).
        self.max_queue = max(0, int(max_queue))
        self._queue: "queue.Queue[_PendingRequest]" = queue.Queue()
        self._closed = False
        # observability counters ({"kind": "stats"} protocol message).
        # Latencies keep a bounded window so a long-lived daemon's memory
        # stays flat; percentiles are computed on demand from the snapshot.
        self._stats_lock = threading.Lock()
        self._t_start = time.monotonic()
        self._n_requests = 0
        self._n_errors = 0
        self._n_rejected = 0
        self._n_batches = 0
        self._live_slots = 0
        self._padded_slots = 0
        self._n_reloads = 0
        self._latencies_ms: "collections.deque[float]" = collections.deque(
            maxlen=4096
        )
        self._batcher: Optional[threading.Thread] = None
        if self.max_batch > 1:
            self._batcher = threading.Thread(target=self._batch_loop,
                                             daemon=True)
            self._batcher.start()

    def _post(self, actions: np.ndarray) -> np.ndarray:
        """Device outputs [B, ...] -> per-request results (host-side). The
        Pi-0 chunk is already continuous; the OpenVLA server overrides this
        with detokenize (+ optional unnormalize)."""
        return actions.astype(np.float32)

    def _dummy_request(self):
        """(image, instruction, proprio) for warmup compiles."""
        size = self.cfg["vision"]["config"]["image_size"]
        return (np.zeros((size, size, 3), np.uint8), "warmup",
                [0.0] * self.cfg["proprio_dim"])

    # ------------------------------------------------------------------

    def warmup(self) -> float:
        """Compile the step for every batch bucket the batcher can emit —
        (1, 2, 4, ... max_batch) under pow2, only max_batch under "max" —
        with dummy requests; returns seconds taken. Without this, the first
        live batch of each size stalls on a fresh XLA compile under the
        device lock (~15s per program over the axon tunnel)."""
        t0 = time.time()
        inputs = self._prepare(*self._dummy_request())
        import jax.numpy as jnp

        bucket = self.max_batch if self.bucket_mode == "max" else self.dp
        while True:
            batched = tuple(
                jnp.concatenate([a] * bucket, axis=0) if bucket > 1 else a
                for a in inputs
            )
            if self._batch_shard is not None:
                import jax

                batched = tuple(
                    jax.device_put(a, self._batch_shard) for a in batched
                )
            with self._lock:
                out = self._step(self.params, *batched, self._base_key, 0)
                np.asarray(out)  # block until compiled + executed
            if bucket >= self.max_batch:
                break
            bucket *= 2
        return time.time() - t0

    def _prepare(self, image: np.ndarray, instruction: str, proprio):
        """Host-side request preprocessing -> (ids, am, px, pr), batch dim 1.
        Raises in the CALLER thread so a malformed request never poisons a
        co-batched one."""
        import jax.numpy as jnp

        proprio = np.asarray(proprio, np.float32)
        expected = int(self.cfg["proprio_dim"])
        if proprio.shape != (expected,):
            raise ValueError(
                f"proprio must have shape ({expected},), got {proprio.shape}"
            )
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError(f"image must be HxWx3 uint8, got {image.shape}")
        size = self.cfg["vision"]["config"]["image_size"]
        if image.shape[:2] != (size, size):
            from blurr_tpu.utils.image import lanczos_resize_uint8

            # shared cv2 > native C++ > jax.image ladder — same pixels as
            # the env adapters
            image = lanczos_resize_uint8(image, size, size)
        chw = np.ascontiguousarray(image.transpose(2, 0, 1))[None]
        with self._tok_lock:
            cached = self._tok_cache.get(instruction)
        if cached is not None:
            ids, am = cached
        else:
            # text-only tokenize: a cache miss must not pay process_images
            # twice (px is computed once below for every request)
            out = self.processor.tokenize([instruction])
            ids, am = out["input_ids"], out["attention_mask"]
            with self._tok_lock:
                if len(self._tok_cache) >= 1024:  # bound daemon memory
                    self._tok_cache.pop(next(iter(self._tok_cache)), None)
                self._tok_cache[instruction] = (ids, am)
        from blurr_tpu.models.pi0.processing import process_images

        px = process_images(chw).astype(self.dtype)
        pr = jnp.asarray(proprio[None, None], self.dtype)
        out = (jnp.asarray(ids), jnp.asarray(am), px, pr)
        if self._replicate is not None:
            import jax

            # commit request tensors to the mesh (replicated) so the sharded
            # step never mixes mesh-committed params with device-0 inputs
            out = tuple(jax.device_put(a, self._replicate) for a in out)
        return out

    def predict(self, image: np.ndarray, instruction: str, proprio) -> np.ndarray:
        """Instrumented entry point: counts requests/errors and records the
        end-to-end (prepare + queue + device + post) latency for stats()."""
        t0 = time.monotonic()
        try:
            result = self._predict_impl(image, instruction, proprio)
        except Exception:
            with self._stats_lock:
                self._n_errors += 1
            raise
        with self._stats_lock:
            self._n_requests += 1
            self._latencies_ms.append((time.monotonic() - t0) * 1000.0)
        return result

    def stats(self) -> dict:
        """Server-side observability snapshot (JSON-safe). Latency
        percentiles cover the last ``len(latencies)`` successful requests;
        batch occupancy/padding tell how well dynamic batching is packing
        the bucketed device programs (padding_frac is the wasted-slot
        fraction the SLO doc quantifies from the outside)."""
        with self._stats_lock:
            lat = list(self._latencies_ms)
            n_req, n_err = self._n_requests, self._n_errors
            n_rej = self._n_rejected
            n_batch = self._n_batches
            live, padded = self._live_slots, self._padded_slots
            uptime = time.monotonic() - self._t_start
        out = {
            "requests_total": n_req,
            "errors_total": n_err,
            "rejected_total": n_rej,
            "queue_depth": self._queue.qsize(),
            "uptime_s": round(uptime, 3),
            "max_batch": self.max_batch,
            "bucket_mode": self.bucket_mode,
            "dp": self.dp,
            "tp": self.tp,
            "closed": self._closed,
            "latency_window": len(lat),
            "checkpoint": self._checkpoint_desc,
            "reloads_total": self._n_reloads,
        }
        if lat:
            p50, p95, p99 = np.percentile(lat, [50, 95, 99])
            out.update(
                latency_ms_p50=round(float(p50), 3),
                latency_ms_p95=round(float(p95), 3),
                latency_ms_p99=round(float(p99), 3),
                latency_ms_mean=round(float(np.mean(lat)), 3),
            )
        if n_batch:
            out.update(
                batches_total=n_batch,
                # raw counters too: scrapers diff counters across
                # snapshots (means don't diff)
                live_slots_total=live,
                padded_slots_total=padded,
                batch_occupancy_mean=round(live / n_batch, 3),
                padding_frac=round(padded / max(1, live + padded), 4),
            )
        return out

    def reload_checkpoint(self, path: str, drop_first: bool = False) -> dict:
        """Weight HOT-RELOAD: swap in a new checkpoint without restarting
        the server or recompiling — the deploy step of the in-repo
        collect → train → validate → serve loop.

        The new tree loads through the SAME path as startup
        (``_build_params``: load → quantize → shard) off the device lock,
        is checked structurally against the live tree (same treedef +
        leaf shapes/dtypes — the already-compiled batch-bucket programs
        must serve it as-is), and is rebound under the device lock, so
        in-flight batches finish on the old weights and the next batch
        runs the new ones. Zero downtime beyond one batch boundary.

        ``drop_first=True`` frees the old tree BEFORE loading — required
        when two copies exceed HBM (bf16-7B on a 16 GB chip) — at the
        cost of atomicity: requests stall for the load, and a FAILED load
        leaves the server without weights (it keeps rejecting until a
        reload succeeds). The default atomic mode keeps serving the old
        tree on any failure."""
        import jax

        if drop_first:
            with self._lock:
                old_desc = self._checkpoint_desc
                self.params = None
                self._checkpoint_desc = f"(reloading from {old_desc})"
                try:
                    self.params = self._build_params(path)
                    self._checkpoint_desc = str(path)
                except Exception:
                    self._checkpoint_desc = f"(reload of {path!r} FAILED)"
                    raise
        else:
            new = self._build_params(path)
            if self.params is None:
                # a prior drop_first reload FAILED: there is no live tree to
                # compare against, and the compiled programs were traced from
                # the startup tree of the same config — rebind directly so a
                # plain atomic reload recovers the server.
                with self._lock:
                    self.params = new
                    self._checkpoint_desc = str(path)
                with self._stats_lock:
                    self._n_reloads += 1
                log.info("hot-reloaded checkpoint (recovery): %s", path)
                return {"reloaded": str(path), "drop_first": False}
            old_leaves, old_def = jax.tree.flatten(self.params)
            new_leaves, new_def = jax.tree.flatten(new)
            if old_def != new_def or any(
                (getattr(o, "shape", None), getattr(o, "dtype", None))
                != (getattr(n, "shape", None), getattr(n, "dtype", None))
                for o, n in zip(old_leaves, new_leaves)
            ):
                raise ValueError(
                    f"checkpoint {path!r} is structurally incompatible with "
                    "the serving config (tree/shape/dtype mismatch) — the "
                    "compiled programs cannot serve it; restart the server "
                    "with the matching config instead"
                )
            with self._lock:
                self.params = new
                self._checkpoint_desc = str(path)
        with self._stats_lock:
            self._n_reloads += 1
        log.info("hot-reloaded checkpoint: %s", path)
        return {"reloaded": str(path), "drop_first": bool(drop_first)}

    def _require_params(self) -> None:
        """Called UNDER self._lock: a drop_first reload in progress holds
        the lock, so requests STALL on it instead of observing the
        transient params=None (checked outside the lock they would error
        mid-reload — caught by experiments/hot_reload_latency.py's smoke
        run). None here means a drop_first load FAILED; the server rejects
        until a reload succeeds."""
        if self.params is None:
            raise RuntimeError(
                "no weights loaded (a drop_first reload failed); "
                "reload a checkpoint"
            )

    def _predict_impl(self, image: np.ndarray, instruction: str, proprio) -> np.ndarray:
        inputs = self._prepare(image, instruction, proprio)
        if self.max_batch <= 1:
            with self._lock:
                self._require_params()
                actions = self._step(
                    self.params, *inputs, self._base_key, self._req_idx
                )
                self._req_idx += 1
                # host-side indexing for the same reason as _run_batch below
                return self._post(np.asarray(actions))[0]
        if self._closed:
            raise RuntimeError("ActionServer is shut down")
        if self.max_queue and self._queue.qsize() >= self.max_queue:
            with self._stats_lock:
                self._n_rejected += 1
            raise RuntimeError(
                f"Overloaded: {self._queue.qsize()} requests queued "
                f"(max_queue={self.max_queue}); retry later"
            )
        pending = _PendingRequest(inputs)
        self._queue.put(pending)
        # bounded waits: a request that raced stop()'s shutdown sentinel (or
        # a dead batcher thread) must not hang its client forever. A CLAIMED
        # request is in a computing batch and will complete (possibly after a
        # multi-second compile), so it keeps waiting.
        while not pending.event.wait(timeout=1.0):
            batcher_dead = (
                self._batcher is not None and not self._batcher.is_alive()
            )
            if pending.claimed:
                if batcher_dead:  # died mid-batch without setting events
                    raise RuntimeError(
                        "ActionServer batcher died while computing the request"
                    )
                continue
            if self._closed or batcher_dead:
                raise RuntimeError(
                    "ActionServer shut down while the request was queued"
                )
        if pending.error is not None:
            raise pending.error
        return pending.result

    # ------------------------------------------------------------------
    # dynamic batching

    def _batch_loop(self) -> None:
        while True:
            first = self._queue.get()
            if first is None:  # shutdown sentinel
                return
            first.claimed = True
            batch = [first]
            shutdown = False
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:  # shutdown sentinel mid-collection
                    shutdown = True
                    break
                item.claimed = True
                batch.append(item)
            self._run_batch(batch)
            if shutdown:
                return

    def _run_batch(self, batch) -> None:
        """Pad to the next power-of-2 bucket (bounds compile count to
        log2(max_batch)+1 programs) — or always to max_batch under
        bucket_mode="max" (ONE program / one resident temp arena) — and run
        ONE device program."""
        import jax.numpy as jnp

        n = len(batch)
        if self.bucket_mode == "max":
            bucket = self.max_batch
        else:
            bucket = self.dp  # smallest bucket the 'data' axis divides
            while bucket < n:
                bucket *= 2
        pad = bucket - n
        with self._stats_lock:
            self._n_batches += 1
            self._live_slots += n
            self._padded_slots += pad

        def cat(i):
            arrs = [b.inputs[i] for b in batch] + [batch[-1].inputs[i]] * pad
            return jnp.concatenate(arrs, axis=0) if len(arrs) > 1 else arrs[0]

        try:
            inputs = tuple(cat(i) for i in range(len(batch[0].inputs)))
            if self._batch_shard is not None:
                import jax

                # split the bucket over the 'data' chips (one reshard per
                # batch; the per-request tensors arrive mesh-replicated)
                inputs = tuple(
                    jax.device_put(a, self._batch_shard) for a in inputs
                )
            with self._lock:
                self._require_params()
                actions = self._step(
                    self.params, *inputs, self._base_key, self._req_idx
                )
                self._req_idx += 1
            # fetch the FULL bucket and slice on host: device-side
            # ``actions[:n]`` is a distinct XLA program per live batch size n,
            # and the first odd n after warmup pays a multi-second compile
            # under the device lock (measured: 8-10 s p99 spikes at 5
            # clients). The extra fetched padding rows are a few hundred
            # bytes.
            out = self._post(np.asarray(actions)[:n])
            for i, b in enumerate(batch):
                b.result = out[i]
                b.event.set()
        except Exception as exc:
            log.exception("batched step failed (%d requests)", n)
            for b in batch:
                b.error = exc
                b.event.set()

    # ------------------------------------------------------------------

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8787,
                      ready_event: Optional[threading.Event] = None) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        log.info("ActionServer listening on %s:%d", host, self.port)
        if ready_event is not None:
            ready_event.set()
        try:
            while True:
                conn, addr = self._sock.accept()
                threading.Thread(
                    target=self._handle, args=(conn,), daemon=True
                ).start()
        except OSError:
            pass  # socket closed by stop()

    def stop(self) -> None:
        self._closed = True  # reject new predicts before the sentinel lands
        if self._sock is not None:
            self._sock.close()
        if self._batcher is not None:
            self._queue.put(None)  # shutdown sentinel

    def _handle(self, conn: socket.socket) -> None:
        with conn:
            while True:
                try:
                    req = recv_msg(conn)
                except ProtocolError as exc:
                    log.warning("protocol error from client: %s", exc)
                    try:
                        send_msg(conn, {"error": f"ProtocolError: {exc}"})
                    except OSError:
                        pass
                    if not exc.recoverable:
                        return  # framing lost — drop the connection
                    continue
                if req is None:
                    return
                if not isinstance(req, dict):
                    # valid JSON but not an object ('[1,2]', '"x"') — keep
                    # the hostile-input containment: reply, don't die
                    try:
                        send_msg(conn, {"error": "request must be a JSON "
                                        f"object, got {type(req).__name__}"})
                    except OSError:
                        return
                    continue
                kind = req.get("kind", "predict")
                if kind == "stats":
                    try:
                        send_msg(conn, self.stats())
                    except OSError:
                        return
                    continue
                if kind == "reload":
                    try:
                        resp = self.reload_checkpoint(
                            str(req["path"]),
                            drop_first=bool(req.get("drop_first", False)),
                        )
                    except Exception as exc:
                        log.exception("reload failed")
                        resp = {"error": f"{type(exc).__name__}: {exc}"}
                    try:
                        send_msg(conn, resp)
                    except OSError:
                        return
                    continue
                if kind != "predict":
                    send_msg(conn, {"error": f"unknown request kind: {kind!r}"})
                    continue
                try:
                    shape = tuple(req["image_shape"])
                    image = np.frombuffer(
                        base64.b64decode(req["image"]), np.uint8
                    ).reshape(shape)
                    t0 = time.time()
                    actions = self.predict(
                        image, req["instruction"], req["proprio"]
                    )
                    send_msg(conn, {
                        "actions": actions.tolist(),
                        "latency_ms": (time.time() - t0) * 1000.0,
                    })
                except Exception as exc:  # keep the connection alive
                    log.exception("request failed")
                    send_msg(conn, {"error": f"{type(exc).__name__}: {exc}"})
