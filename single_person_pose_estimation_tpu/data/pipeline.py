"""Input pipeline: record shards -> batched host tensors.

TPU-first split of responsibilities (SURVEY.md §7 stage 4): the host does
only what a TPU cannot — read record shards (native mmap reader), decode
JPEG, resize to the fixed 256x256 input — on a background prefetch thread.
Everything the reference ran per-example in Python on the host (imgaug
affine warp, photometric jitter, Gaussian heatmap rendering through TWO
``tf.numpy_function`` process boundaries, dataset_builder.py:201-238) runs
instead inside the jitted train step on device (training/steps.py).

API mirrors the reference DatasetBuilder (dataset_builder.py:10-67):
``DatasetBuilder(config, ratio)``, ``build_datasets()`` ->
(train, valid) iterators, ``get_ds_prediction()``, plus
``num_train_examples`` / ``num_valid_examples`` with the same
filename-suffix length accounting.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
import time
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.data import example_codec, tfrecord
from single_person_pose_estimation_tpu.data.images import (
    decode_jpeg,
    resize_bilinear,
    resize_bilinear_u8,
)


def _parse_example(record: bytes, config: Config, training: bool
                   ) -> Dict[str, np.ndarray]:
    """Record bytes -> {image [H,W,3] f32 in [0,1], kx, ky (heatmap space), kv}.

    Replicates parse_tfrecord_fn + prepare_example
    (dataset_builder.py:241-269, 89-113): decode image to float, resize to
    256x256, rescale keypoints from crop-pixel space directly into 64x64
    heatmap space by dividing by the stored crop width/height.
    """
    ex = example_codec.decode_example(record)
    K = config.num_keypoints
    img = decode_jpeg(ex["image"][0])
    width = float(ex["width"][0])
    height = float(ex["height"][0])
    if getattr(config, "train_transfer_dtype", "float32") == "uint8" \
            and training:
        # uint8 wire: resize in uint8 (SIMD fixed-point) and ship the crop
        # quantized; the train step normalizes on device (training/
        # steps.py). 4x less host->device traffic and ~2x less host CPU
        # than decode->f32-resize->/255 (PERF.md breakdown).
        img = resize_bilinear_u8(
            img, (config.image_height, config.image_width))
    else:
        img = resize_bilinear(
            img, (config.image_height, config.image_width))
        img = (img / 255.0).astype(np.float32)

    def fixed(vals, dtype):
        arr = np.zeros((K,), dtype=dtype)
        arr[:min(K, len(vals))] = vals[:K]
        return arr

    kx = fixed(ex.get("keypoints/x", []), np.float32)
    ky = fixed(ex.get("keypoints/y", []), np.float32)
    kv = fixed(ex.get("keypoints/vis", []), np.int64).astype(np.int32)
    kx = kx / width * config.label_width
    ky = ky / height * config.label_height
    return {"image": img, "kx": kx, "ky": ky, "kv": kv}


def _parse_prediction_example(record: bytes, config: Config):
    """Record bytes -> (image, meta) with un-cropping metadata
    (prepare_prediction_example, dataset_builder.py:115-138)."""
    ex = example_codec.decode_example(record)
    K = config.num_keypoints
    img = decode_jpeg(ex["image"][0])
    if getattr(config, "eval_transfer_dtype", "float32") == "uint8":
        # uint8 wire: ship the quantized crop, normalize on device
        # (make_predict_decode_fn) — 4x less host->device traffic, the
        # same trade the training path and PoseServer make.
        img = resize_bilinear_u8(
            img, (config.image_height, config.image_width))
        return img, _prediction_meta(ex, config, K)
    img = resize_bilinear(img, (config.image_height, config.image_width)) / 255.0
    return img.astype(np.float32), _prediction_meta(ex, config, K)


def _prediction_meta(ex, config: Config, K: int):
    def fixed(vals, dtype):
        arr = np.zeros((K,), dtype=dtype)
        arr[:min(K, len(vals))] = vals[:K]
        return arr

    # Un-crop geometry. Normally the stored crop IS the square bbox, so
    # width/height double as the square side. Records written with
    # config.record_image_size > 0 store the crop RESIZED to that side
    # (keypoints rescaled with it) while bbox_x/bbox_y stay in original-
    # image pixels — for those, recover the true square side from
    # original_bbox (same transform_bbox_square math as the ETL) or the
    # un-crop mapping compresses every coordinate by resized/true.
    stored_w, stored_h = int(ex["width"][0]), int(ex["height"][0])
    bbox_w, bbox_h = stored_w, stored_h
    original_bbox = np.asarray(ex.get("original_bbox", [0, 0, 0, 0]),
                               dtype=np.float32)
    side = int(max(original_bbox[2], original_bbox[3]) * config.bbox_scale)
    if side > 0 and (side, side) != (stored_w, stored_h):
        bbox_w, bbox_h = side, side

    meta = {
        "ann_id": int(ex["ann_id"][0]),
        "image_id": int(ex["image_id"][0]),
        "coco_url": bytes(ex.get("coco_url", [b""])[0]),
        "keypoints/x": fixed(ex.get("keypoints/x", []), np.float32),
        "keypoints/y": fixed(ex.get("keypoints/y", []), np.float32),
        "keypoints/vis": fixed(ex.get("keypoints/vis", []), np.int64),
        "bbox_x": float(ex["bbox_x"][0]),
        "bbox_y": float(ex["bbox_y"][0]),
        "bbox_w": bbox_w,                # true square bbox side
        "bbox_h": bbox_h,
        "frame_w": stored_w,             # frame the keypoints are stored in
        "frame_h": stored_h,
        "original_bbox": original_bbox,
    }
    return meta


def _stack_batch(examples: Sequence[Dict[str, np.ndarray]]):
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


def _make_decode_pool(config: Config, prefix: str):
    """(pool, on_stop, workers) for the host decode stage. JPEG decode +
    resize release the GIL, so a thread pool scales across host cores;
    serial (pool=None) on a single-core host. on_stop reaps the workers
    when the consuming iterator stops — otherwise every build leaks
    `workers` idle threads for the process lifetime."""
    workers = getattr(config, "host_workers", 0) or max(
        1, min(4, (os.cpu_count() or 1) - 1))
    if workers <= 1:
        return None, None, workers
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(workers, thread_name_prefix=prefix)
    return pool, (lambda: pool.shutdown(wait=False, cancel_futures=True)), \
        workers


def _pipelined_map(fn, it: Iterator, pool, depth: int):
    """Ordered parallel map with a bounded in-flight window (decode/resize
    release the GIL, so a thread pool scales across host cores)."""
    from collections import deque

    q = deque()
    for item in it:
        q.append(pool.submit(fn, item))
        if len(q) >= depth:
            yield q.popleft().result()
    while q:
        yield q.popleft().result()


class _Prefetcher:
    """Runs an iterator on a background thread with a bounded queue.

    cv2's JPEG decode releases the GIL, so host decode overlaps device
    steps even on a single core. The producer polls a stop event while
    putting so abandoned iterators shut down cleanly at interpreter exit
    instead of dying blocked on a full queue.

    `map_fn` (optional) is applied to each item ON the producer thread —
    data.device_prefetch uses it for the host->device copy so batch N+1
    moves over the wire while the device runs batch N.

    Stage-time accounting (cumulative seconds) is built in so bench.py
    can report which stage binds from the artifact alone: `host_wait_s`
    (producer blocked on next(it)), `map_s` (inside map_fn),
    `consumer_wait_s` (consumer blocked on the queue), `batches`.
    """

    _SENTINEL = object()

    def __init__(self, it: Iterator, depth: int = 4, on_stop=None,
                 map_fn=None):
        if depth < 1:
            raise ValueError(f"depth must be >= 1: {depth}")
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._on_stop = on_stop  # e.g. ThreadPoolExecutor.shutdown
        self._map = map_fn
        self.host_wait_s = 0.0
        self.map_s = 0.0
        self.consumer_wait_s = 0.0
        self.batches = 0
        self._thread = threading.Thread(target=self._run, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _run(self, it):
        try:
            while not self._stop.is_set():
                t0 = time.perf_counter()
                try:
                    item = next(it)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                if self._map is not None:
                    item = self._map(item)
                t2 = time.perf_counter()
                self.host_wait_s += t1 - t0
                self.map_s += t2 - t1
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            # Surface producer failures (corrupt record, decode error) to
            # the consumer instead of masquerading as a clean end-of-data
            # StopIteration — a silently truncated "infinite" train
            # iterator would end the training loop with no diagnostic.
            self._error = e
        finally:
            # Deliver the sentinel even against a full queue (put_nowait
            # would drop it and the consumer would block forever once the
            # buffered items drain); give up only if the consumer closed.
            while not self._stop.is_set():
                try:
                    self._q.put(self._SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue
            if self._on_stop is not None:
                try:
                    self._on_stop()
                except Exception:
                    pass

    def close(self) -> None:
        self._stop.set()
        # Best-effort direct sentinel so a blocked consumer wakes NOW
        # instead of on its 0.5 s liveness poll (advisor r4); if the
        # queue is full the consumer has items to drain and will hit the
        # producer-exit path normally.
        try:
            self._q.put_nowait(self._SENTINEL)
        except queue.Full:
            pass

    def __del__(self):
        self._stop.set()

    def __iter__(self):
        return self

    def __next__(self):
        t0 = time.perf_counter()
        while True:
            try:
                item = self._q.get(timeout=0.5)
                break
            except queue.Empty:
                # A producer stopped mid-put (close() raced its put loop)
                # exits without delivering the sentinel; without this
                # liveness check the consumer would block here forever.
                if not self._thread.is_alive():
                    item = self._SENTINEL
                    break
        self.consumer_wait_s += time.perf_counter() - t0
        if item is self._SENTINEL:
            if self._error is not None:
                raise RuntimeError(
                    "data pipeline producer failed") from self._error
            raise StopIteration
        self.batches += 1
        return item


class DatasetBuilder:
    """Builds train/valid/prediction iterators from record shards.

    Multi-host: pass process_index/process_count (or rely on
    jax.process_index()/count via parallel.distributed) to give each host a
    disjoint round-robin subset of the shard files — the host-local half of
    global-batch data parallelism (assemble with mesh.shard_local_batch).
    """

    def __init__(self, config: Config, ratio: float = 1.0,
                 process_index: int = 0, process_count: int = 1):
        if not 0 < ratio <= 1:
            raise ValueError("ratio must be in (0, 1]")
        self.config = config
        self.train_filenames = sorted(
            glob.glob(os.path.join(config.train_tfrecords_dir, "*.tfrec")))
        self.valid_filenames = sorted(
            glob.glob(os.path.join(config.valid_tfrecords_dir, "*.tfrec")))
        if ratio < 1:
            self.train_filenames = self.train_filenames[
                :int(np.ceil(ratio * len(self.train_filenames)))]
            self.valid_filenames = self.valid_filenames[
                :int(np.ceil(ratio * len(self.valid_filenames)))]
        if process_count > 1:
            from single_person_pose_estimation_tpu.parallel.distributed import (
                shard_files_for_process,
            )
            self.train_filenames = shard_files_for_process(
                self.train_filenames, process_index, process_count)
            self.valid_filenames = shard_files_for_process(
                self.valid_filenames, process_index, process_count,
                allow_replicate=True)
        self.num_train_examples = tfrecord.count_examples_from_filenames(
            self.train_filenames)
        self.num_valid_examples = tfrecord.count_examples_from_filenames(
            self.valid_filenames)
        self._rng = np.random.default_rng(config.seed)
        print(f"Train dataset with {len(self.train_filenames)} shards and "
              f"{self.num_train_examples} examples.")
        print(f"Valid dataset with {len(self.valid_filenames)} shards and "
              f"{self.num_valid_examples} examples.")

    # -- raw record streams ------------------------------------------------

    def _record_stream(self, filenames: Sequence[str], shuffle: bool,
                       repeat: bool) -> Iterator[bytes]:
        buffer_size = self.config.shuffle_buffer if shuffle else 0
        while True:
            order = list(filenames)
            if shuffle:
                self._rng.shuffle(order)
            buf: List[bytes] = []
            for path in order:
                for rec in tfrecord.iter_records(path):
                    if not buffer_size:
                        yield rec
                    else:
                        buf.append(rec)
                        if len(buf) > buffer_size:
                            j = int(self._rng.integers(len(buf)))
                            buf[j], buf[-1] = buf[-1], buf[j]
                            yield buf.pop()
            while buf:
                j = int(self._rng.integers(len(buf)))
                buf[j], buf[-1] = buf[-1], buf[j]
                yield buf.pop()
            if not repeat:
                return

    # -- public API --------------------------------------------------------

    def _batches(self, filenames, shuffle, repeat, training):
        cfg = self.config
        pool, on_stop, workers = _make_decode_pool(cfg, "spe-decode")

        def gen():
            # Batch *within* an epoch then repeat — matching the reference's
            # ds.batch(B).repeat() ordering (dataset_builder.py:44-45), so
            # the final batch of each epoch is partial rather than wrapping.
            while True:
                batch: List[Dict[str, np.ndarray]] = []
                stream = self._record_stream(filenames, shuffle,
                                             repeat=False)
                if pool is None:
                    examples = (_parse_example(r, cfg, training)
                                for r in stream)
                else:
                    examples = _pipelined_map(
                        lambda r: _parse_example(r, cfg, training),
                        stream, pool, depth=2 * workers)
                for ex in examples:
                    batch.append(ex)
                    if len(batch) == cfg.batch_size:
                        yield _stack_batch(batch)
                        batch = []
                if batch:
                    yield _stack_batch(batch)
                if not repeat:
                    return

        return _Prefetcher(gen(), on_stop=on_stop)

    def build_datasets(self):
        """(train, valid) batch iterators. Train: shard+buffer shuffled,
        infinite. Valid: ordered, infinite (reference repeats both,
        dataset_builder.py:45,53); use steps_per_epoch externally."""
        train = self._batches(self.train_filenames, shuffle=True,
                              repeat=True, training=True)
        valid = self._batches(self.valid_filenames, shuffle=False,
                              repeat=True, training=False)
        return train, valid

    def get_ds_prediction(self):
        """Finite iterator of (images [B,256,256,3], meta list) over the
        valid split, metadata preserved for un-cropping (eval parity with
        get_ds_prediction, dataset_builder.py:58-67).

        Decode/resize runs through the same thread pool as the training
        path (VERDICT r3 Weak #4: the serial decode starved on-chip
        inference at 3,100+ img/s — flip-TTA doubly so), then batches are
        handed over on a prefetch thread."""
        cfg = self.config
        pool, on_stop, workers = _make_decode_pool(cfg, "spe-pred")

        def gen():
            stream = self._record_stream(self.valid_filenames,
                                         shuffle=False, repeat=False)
            if pool is None:
                pairs = (_parse_prediction_example(r, cfg) for r in stream)
            else:
                pairs = _pipelined_map(
                    lambda r: _parse_prediction_example(r, cfg),
                    stream, pool, depth=2 * workers)
            images: List[np.ndarray] = []
            metas: List[Dict] = []
            for img, meta in pairs:
                images.append(img)
                metas.append(meta)
                if len(images) == cfg.batch_size:
                    yield np.stack(images), metas
                    images, metas = [], []
            if images:
                yield np.stack(images), metas

        return _Prefetcher(gen(), on_stop=on_stop)
