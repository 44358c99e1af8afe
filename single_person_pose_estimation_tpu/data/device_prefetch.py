"""Double-buffered host->device batch prefetch.

The reference overlaps host preprocessing with device compute through
tf.data's `prefetch(AUTOTUNE)` (dataset_builder.py:39-46); the host->GPU
copy itself is hidden by Keras' internal pipelining. In the JAX rebuild the
host pipeline already runs on its own thread (data/pipeline._Prefetcher),
but a bare ``train_step(state, next(it))`` loop still serializes the
host->device transfer into every iteration: jit called with numpy operands
copies them to the device *on the caller's thread* before dispatch, and on
a tunneled TPU (~50 MB/s for the uint8 wire) that copy is the largest
per-step term. BENCH_r03 measured exactly this failure: 82.6 img/s
end-to-end against a 254 img/s wire bound (VERDICT.md Weak #1).

``DevicePrefetcher`` fixes it with the standard double-buffering recipe:
a dedicated transfer thread pulls batch N+1 from the host iterator and
``jax.device_put``s it (optionally through a NamedSharding, optionally
padded to the device count) while the device executes step N. The consumer
receives device-resident arrays, so its dispatch is instant and the three
stages — host decode, wire, device step — overlap; steady-state throughput
approaches min(host, wire, step) instead of their serial sum.

Wait-time accounting is built in (`host_wait_s` on the transfer thread,
`get_wait_s` on the consumer side) so bench.py can report *which* stage
binds from the artifact alone.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wrap a host batch iterator; yield device-resident batches.

    Args:
      it: iterator of pytrees of host (numpy) arrays.
      depth: queue bound = number of batches resident on device ahead of
        the consumer (2 = classic double buffering; more helps only when
        per-batch transfer times are bursty).
      put_fn: optional batch -> device batch override (e.g.
        ``lambda b: mesh_lib.shard_batch(b, mesh)``). Default: plain
        ``jax.device_put`` to the default device.
      device: target for the default put_fn (a Device or Sharding).

    The transfer thread exits when the source iterator ends or `close()`
    is called; producer exceptions re-raise at the consumer's `next()`.
    """

    _SENTINEL = object()

    def __init__(self, it: Iterator, depth: int = 2,
                 put_fn: Optional[Callable] = None, device=None):
        if depth < 1:
            raise ValueError(f"depth must be >= 1: {depth}")
        if put_fn is None:
            def put_fn(batch):
                return jax.device_put(batch, device)
        self._put = put_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        # Stage-time accounting (seconds, cumulative).
        self.host_wait_s = 0.0      # transfer thread blocked on next(it)
        self.put_s = 0.0            # time inside device_put (wire enqueue)
        self.consumer_wait_s = 0.0  # consumer blocked on the queue
        self.batches = 0
        self._thread = threading.Thread(target=self._run, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _run(self, it):
        import time
        try:
            while not self._stop.is_set():
                t0 = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                dev_batch = self._put(batch)
                t2 = time.perf_counter()
                self.host_wait_s += t1 - t0
                self.put_s += t2 - t1
                while not self._stop.is_set():
                    try:
                        self._q.put(dev_batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            self._error = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(self._SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self) -> None:
        self._stop.set()
        src = getattr(self, "_src_close", None)
        if src is not None:
            src()

    def __del__(self):
        self._stop.set()

    def __iter__(self):
        return self

    def __next__(self):
        import time
        t0 = time.perf_counter()
        item = self._q.get()
        self.consumer_wait_s += time.perf_counter() - t0
        if item is self._SENTINEL:
            if self._error is not None:
                raise RuntimeError(
                    "device prefetch producer failed") from self._error
            raise StopIteration
        self.batches += 1
        return item


def device_prefetch(it: Iterator, depth: int = 2, mesh=None,
                    n_pad_devices: Optional[int] = None) -> DevicePrefetcher:
    """Convenience wrapper used by the Trainer: plain device_put without a
    mesh; pad-to-device-count + batch-shard with one (the device half of
    `Trainer._put_batch`, moved off the step loop's critical path)."""
    if mesh is None:
        pf = DevicePrefetcher(it, depth=depth)
    else:
        import numpy as np

        from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib

        n_dev = n_pad_devices or int(np.prod(mesh.devices.shape))

        def put_fn(batch):
            batch, _ = mesh_lib.pad_batch_to_devices(batch, n_dev)
            return mesh_lib.shard_batch(batch, mesh)

        pf = DevicePrefetcher(it, depth=depth, put_fn=put_fn)
    # Propagate close() to the host-side prefetcher so abandoning the
    # device iterator also reaps the decode thread/pool.
    pf._src_close = getattr(it, "close", None)
    return pf
