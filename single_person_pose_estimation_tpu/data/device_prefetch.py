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

The thread/queue/sentinel machinery is `data.pipeline._Prefetcher`'s —
this class only supplies the device-put map step (run ON the producer
thread, which is what moves the copy off the step loop) and source-close
propagation. Wait-time accounting (`host_wait_s`, `put_s`,
`consumer_wait_s`) comes with it, so bench.py can report *which* stage
binds from the artifact alone.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax

from single_person_pose_estimation_tpu.data.pipeline import _Prefetcher


class DevicePrefetcher(_Prefetcher):
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
    `on_stop` (e.g. the source iterator's close) runs ON the producer
    thread when it exits — the thread that owns the source generator, so
    closing a raw generator is safe (calling gen.close() from the
    consumer thread while the producer is inside next(it) raises
    "generator already executing").
    """

    def __init__(self, it: Iterator, depth: int = 2,
                 put_fn: Optional[Callable] = None, device=None,
                 on_stop: Optional[Callable] = None):
        if put_fn is None:
            def put_fn(batch):
                return jax.device_put(batch, device)
        super().__init__(it, depth=depth, map_fn=put_fn, on_stop=on_stop)

    @property
    def put_s(self) -> float:
        """Cumulative seconds inside device_put (wire enqueue)."""
        return self.map_s


def device_prefetch(it: Iterator, depth: int = 2, mesh=None,
                    n_pad_devices: Optional[int] = None) -> DevicePrefetcher:
    """Convenience wrapper used by the Trainer: plain device_put without a
    mesh; pad-to-device-count + batch-shard with one (the device half of
    `Trainer._put_batch`, moved off the step loop's critical path)."""
    if mesh is None:
        pf = DevicePrefetcher(it, depth=depth,
                              on_stop=getattr(it, "close", None))
    else:
        import numpy as np

        from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib

        if jax.process_count() > 1:
            # Multi-process: this process's host iterator yields only its
            # LOCAL shard of the global batch (DatasetBuilder
            # process_index/process_count file sharding); assemble the
            # global array from per-process locals. Pad to the LOCAL
            # device count — every process must pad identically for the
            # global shape to agree.
            n_local = n_pad_devices or len(
                [d for d in mesh.devices.flat
                 if d.process_index == jax.process_index()])

            def put_fn(batch):
                batch, _ = mesh_lib.pad_batch_to_devices(batch, n_local)
                return mesh_lib.shard_local_batch(batch, mesh)
        else:
            n_dev = n_pad_devices or int(np.prod(mesh.devices.shape))

            def put_fn(batch):
                batch, _ = mesh_lib.pad_batch_to_devices(batch, n_dev)
                return mesh_lib.shard_batch(batch, mesh)

        pf = DevicePrefetcher(it, depth=depth, put_fn=put_fn,
                              on_stop=getattr(it, "close", None))
    return pf
