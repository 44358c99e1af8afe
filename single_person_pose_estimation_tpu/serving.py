"""Batched pose-estimation serving: micro-batching queue over the fused
TPU forward + on-device decode.

The reference's only "serving" is the Colab webcam loop (demo.ipynb /
javascript_utils.py): one synchronous model.predict per frame. This module
is the production-shaped equivalent for a TPU chip: callers submit single
images from any thread and get a Future; a batcher thread drains the queue,
pads each micro-batch to a fixed BUCKET size (static shapes — one XLA
compilation per bucket, reused forever), runs ONE jitted program (forward,
last stack only + argmax/offset decode, eval.py:108/data_utils.py:135-183
semantics) and resolves the futures. Padding rows are dead work, not
recompiles.

Design notes (TPU-first):
- Static bucket shapes keep everything on the compile-once path; the
  bucket ladder trades padding waste against compile count.
- The batcher admits at most `max_batch` requests per step and waits at
  most `max_wait_s` for stragglers: latency is bounded by
  max_wait_s + one model step.
- decode runs on device inside the same program — the host only sees
  (B, K, 3) keypoints, not (B, 64, 64, 17) heatmaps (60x less host
  traffic per request).
- `mesh=` shards each bucket over the data axis of a device mesh
  (jax.sharding.NamedSharding) for multi-chip serving.
- `transfer_dtype="uint8"` sends pixels as bytes and normalizes to
  [0, 1] ON DEVICE — 4x less host->device traffic than f32 (production
  inputs are JPEG-decoded uint8 anyway). "bfloat16" halves traffic with
  rounding-level error; "float32" is exact.
- Dispatch is PIPELINED: the batcher fires the jitted step and hands the
  in-flight device result to a resolver thread, so batch N+1's
  host->device transfer and compute overlap batch N's readback
  (max_in_flight bounds device memory).

Tunnel caveat: on this dev environment's remote TPU, host<->device
bandwidth through the tunnel (not the chip) dominates serving throughput;
scripts/bench_serving.py numbers reflect the tunnel, not v5e PCIe.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu.ops.decode import _decode_v2, decode_v1


class PoseServer:
    """Micro-batching inference server for the stacked hourglass.

    Args:
      model: StackedHourglass (standard or mobile — the fused path routes
        the mobile Pallas kernels for mobile models).
      params, batch_stats: trained variables.
      buckets: ascending micro-batch sizes; a request batch of n pads to
        the smallest bucket >= n. The largest bucket is max_batch.
      max_wait_s: how long the batcher waits to fill a larger bucket.
      use_fused: route through models.fused_inference.fused_apply
        (TPU Pallas kernels). "auto" = only on TPU backends.
      decode_version / legacy / conf_threshold: reference decode knobs
        (utilities/data_utils.py:100-183).
      mesh: optional jax.sharding.Mesh with a "data" axis for multi-chip
        batch sharding. Every bucket must be divisible by the data-axis
        size (device_put of a 1-row batch over 8 devices cannot shard);
        buckets are rounded UP to the nearest multiple automatically and
        deduplicated, so e.g. (1, 4, 16, 64) over an 8-way mesh becomes
        (8, 16, 64).
    """

    def __init__(self, model, params, batch_stats,
                 buckets: Sequence[int] = (1, 4, 16, 64),
                 max_wait_s: float = 0.002,
                 use_fused="auto",
                 decode_version: int = 2,
                 legacy: bool = True,
                 conf_threshold: float = 1e-6,
                 mesh=None,
                 transfer_dtype: str = "uint8",
                 max_in_flight: int = 2,
                 interpret: bool = False):
        if sorted(set(buckets)) != list(buckets):
            raise ValueError(f"buckets must be ascending+unique: {buckets}")
        if mesh is not None:
            dsz = mesh.shape["data"]
            buckets = tuple(sorted({-(-b // dsz) * dsz for b in buckets}))
        self._model = model
        self._variables = {"params": params, "batch_stats": batch_stats}
        self._buckets = tuple(buckets)
        self._bucket_set = frozenset(self._buckets)
        self._max_wait_s = max_wait_s
        self._interpret = interpret
        self._fused_auto = use_fused == "auto"
        if self._fused_auto:
            from single_person_pose_estimation_tpu.models.fused_inference import (
                auto_use_fused,
            )
            use_fused = auto_use_fused(model)
        self._use_fused = bool(use_fused)
        self._mesh = mesh
        if transfer_dtype not in ("uint8", "bfloat16", "float32"):
            raise ValueError(f"transfer_dtype: {transfer_dtype!r}")
        self._transfer_dtype = transfer_dtype
        if decode_version == 1:
            self._decode = partial(decode_v1, conf_threshold=conf_threshold)
        else:
            self._decode = partial(_decode_v2, conf_threshold=conf_threshold,
                                   legacy=legacy)
        self._step = jax.jit(self._step_impl)
        self._queue: "queue.Queue" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max_in_flight)
        self._closed = False
        self._latencies: list = []
        self._served = 0
        self._steps = 0
        self._lock = threading.Lock()
        # Makes submit()'s closed-check + enqueue atomic against close()
        # flipping _closed, so no request can slip in after close() has
        # drained the queue (its future would never resolve).
        self._close_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          daemon=True)
        self._thread.start()
        self._resolver.start()

    # ------------------------------------------------------------------
    # Device step.
    # ------------------------------------------------------------------

    def _forward(self, variables, images):
        # Backend policy (incl. the auto >256px flax fallback) lives in
        # models/fused_inference.forward_last_stack — one source for
        # serving and evaluation.predict.
        from single_person_pose_estimation_tpu.models.fused_inference import (
            forward_last_stack,
        )
        return forward_last_stack(self._model, variables, images,
                                  use_fused=self._use_fused,
                                  auto=self._fused_auto,
                                  interpret=self._interpret)

    def _step_impl(self, variables, images):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        elif images.dtype != jnp.float32:
            images = images.astype(jnp.float32)
        hms = self._forward(variables, images)
        return jax.vmap(self._decode)(hms)

    def _host_dtype(self):
        import numpy as _np
        return {"uint8": _np.uint8, "bfloat16": jnp.bfloat16,
                "float32": _np.float32}[self._transfer_dtype]

    def _to_wire(self, img: np.ndarray) -> np.ndarray:
        if self._transfer_dtype == "uint8":
            return np.clip(np.asarray(img, np.float32) * 255.0 + 0.5,
                           0, 255).astype(np.uint8)
        return np.asarray(img).astype(self._host_dtype())

    def warmup(self, image_shape=(256, 256, 3)):
        """Compile every bucket up front (cold compiles through the TPU
        tunnel take minutes — do this before accepting traffic)."""
        for b in self._buckets:
            x = jnp.zeros((b, *image_shape), self._host_dtype())
            if self._mesh is not None:
                x = self._shard(x)
            jax.block_until_ready(self._step(self._variables, x))

    def _shard(self, x):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(
            x, NamedSharding(self._mesh, P("data", None, None, None)))

    # ------------------------------------------------------------------
    # Public API.
    # ------------------------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one (H, W, 3) float image in [0, 1]; resolves to a
        (K, 3) float32 array of x, y, confidence in heatmap units."""
        wire = self._to_wire(image)  # convert outside the lock
        with self._close_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            fut: Future = Future()
            self._queue.put((wire, fut, time.perf_counter()))
        return fut

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Synchronous batch convenience: (N, H, W, 3) -> (N, K, 3)."""
        futs = [self.submit(img) for img in images]
        if not futs:
            return np.zeros((0, self._model.num_classes, 3), np.float32)
        return np.stack([f.result() for f in futs])

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            n = len(lat)
            return {
                "served": self._served,
                "steps": self._steps,
                "avg_batch": self._served / max(1, self._steps),
                "latency_p50_ms": 1e3 * lat[n // 2] if n else None,
                "latency_p99_ms": 1e3 * lat[min(n - 1, int(n * 0.99))]
                                  if n else None,
            }

    def close(self):
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            # Under the lock no submit() can now enqueue: anything in the
            # queue precedes the sentinel below and the batcher will serve
            # it before terminating.
        self._queue.put(None)  # wake the batcher
        # Join WITHOUT a timeout: a timed-out join here would enqueue the
        # resolver sentinel ahead of a still-in-flight batch (e.g. one
        # stuck in a long cold compile), leaving its futures unresolved
        # forever. The batcher always terminates once it drains to the
        # sentinel, so this wait is finite.
        self._thread.join()
        self._inflight.put(None)  # wake the resolver after the batcher
        self._resolver.join()
        # Safety net: _close_lock guarantees no submit() enqueues after
        # _closed flips, but if the batcher died abnormally (exception,
        # test harness retiring it) requests may still sit in the queue.
        # Fail their futures rather than leave callers blocked forever.
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("server is closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    # Batcher loop.
    # ------------------------------------------------------------------

    def _take_batch(self):
        """Block for the first request, then admit up to max_batch,
        waiting at most max_wait_s for stragglers."""
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.perf_counter() + self._max_wait_s
        max_batch = self._buckets[-1]
        while len(batch) < max_batch:
            if len(batch) in self._bucket_set:
                # Bucket boundary exactly filled: ship immediately unless
                # more work is already queued (no padding, no extra wait).
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
            else:
                remaining = deadline - time.perf_counter()
                try:
                    item = self._queue.get(timeout=remaining) \
                        if remaining > 0 else self._queue.get_nowait()
                except queue.Empty:
                    break
            if item is None:
                self._queue.put(None)  # re-signal shutdown after draining
                break
            batch.append(item)
        return batch

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        return self._buckets[-1]

    def _loop(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            images = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            t_in = [b[2] for b in batch]
            n = len(images)
            bucket = self._bucket_for(n)
            x = np.zeros((bucket, *images[0].shape), images[0].dtype)
            for i, img in enumerate(images):
                x[i] = img
            xj = jnp.asarray(x)
            if self._mesh is not None:
                xj = self._shard(xj)
            try:
                # Async dispatch: hand the un-materialized device result
                # to the resolver so the next batch's transfer + compute
                # overlap this one's completion/readback.
                out = self._step(self._variables, xj)
            except Exception as e:  # resolve futures with the error
                for f in futs:
                    f.set_exception(e)
                continue
            self._inflight.put((out, futs, t_in, n))

    def _resolve_loop(self):
        while True:
            item = self._inflight.get()
            if item is None:
                return
            out, futs, t_in, n = item
            try:
                res = np.asarray(out)
            except Exception as e:
                for f in futs:
                    f.set_exception(e)
                continue
            now = time.perf_counter()
            with self._lock:
                self._steps += 1
                self._served += n
                self._latencies.extend(now - t for t in t_in)
                if len(self._latencies) > 10000:
                    self._latencies = self._latencies[-5000:]
            for i, f in enumerate(futs):
                f.set_result(res[i])
