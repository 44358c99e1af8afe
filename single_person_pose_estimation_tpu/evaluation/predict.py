"""Batched prediction over the validation split for OKS/PCK evaluation.

Reference predict_ds (eval.py:99-146) runs model.predict per batch then
decodes each example's heatmaps in a Python loop over 5647 x 17 channels on
the host. Here both the forward pass (last stack only, eval.py:108) and the
argmax+offset decode run in ONE jitted program on device; the host merely
un-crops the resulting keypoints into original-image coordinates
(_undo_bbox, eval.py:153-158) and assembles the JSON records.
"""

from __future__ import annotations

import json
from functools import lru_cache, partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu.ops.augment import (
    DEFAULT_FLIP_PAIRS,
    _flip_permutation,
)
from single_person_pose_estimation_tpu.ops.decode import _decode_v2, decode_v1


def unflip_heatmaps(hms: jnp.ndarray, flip_perm: jnp.ndarray,
                    shift: bool = True) -> jnp.ndarray:
    """Map heatmaps predicted on a horizontally MIRRORED input back into
    the original frame: mirror the width axis and swap the left/right
    keypoint channels (the same flip pairs the training augmentation
    swaps, dataset_builder.py:271-301).

    hms: (B, H, W, K); flip_perm: (K,) channel permutation.

    shift=True re-aligns the mirrored grid by one column: the stride-4
    heatmap grid is not mirror-symmetric about the image center (input
    column c lands in bin c//4, so mirroring the input sends a keypoint
    at x to W_in-1-x whose bin is offset by the intra-bin phase), and
    shifting the un-mirrored maps one column right — keeping column 0 —
    is the standard correction used by hourglass-family eval pipelines.
    """
    out = hms[:, :, ::-1, flip_perm]
    if shift:
        out = jnp.concatenate([out[:, :, :1, :], out[:, :, :-1, :]], axis=2)
    return out


def make_predict_decode_fn(model, conf_threshold: float = 1e-6,
                           legacy: bool = True, version: int = 2,
                           use_fused="auto", interpret: bool = False,
                           flip_test: bool = False,
                           flip_pairs=DEFAULT_FLIP_PAIRS,
                           flip_shift: bool = True,
                           mesh=None):
    """Memoized `_build_predict_decode_fn`: repeated predict_ds /
    PoseServer calls with the same options reuse ONE `jax.jit` object, so
    only the first call pays tracing + compile-cache load (~2.7 s plain /
    ~5.4 s flip-TTA per call through the TPU tunnel, measured — the r4
    eval bench spent a third of its timed run there). All key parts are
    hashable: flax Modules are frozen dataclasses, Mesh hashes by
    (devices, axis_names).

    use_fused="auto" is resolved against the CURRENT backend BEFORE the
    cache lookup — a platform switch mid-process (e.g. the dryrun's
    forced CPU mesh after a TPU init) re-resolves instead of replaying a
    fused-path program the new backend cannot compile."""
    auto = use_fused == "auto"
    if auto:
        from single_person_pose_estimation_tpu.models.fused_inference import (
            auto_use_fused,
        )

        use_fused = auto_use_fused(model)
    return _cached_predict_decode_fn(
        model, conf_threshold, legacy, version, use_fused, auto, interpret,
        flip_test, tuple(tuple(p) for p in flip_pairs), flip_shift, mesh)


def clear_predict_cache() -> None:
    """Drop all memoized predict fns (and with them their compiled
    executables, Meshes, and device-resident constants). Call from any
    backend-reset path — e.g. __graft_entry__._force_cpu_mesh does — or
    from long-lived processes cycling many model configs (advisor r4:
    the LRU otherwise pins up to 16 stale entries of device memory for
    the process lifetime)."""
    _cached_predict_decode_fn.cache_clear()


@lru_cache(maxsize=16)
def _cached_predict_decode_fn(model, conf_threshold, legacy, version,
                              use_fused, auto, interpret, flip_test,
                              flip_pairs, flip_shift, mesh):
    """Jitted (params, batch_stats, images) -> (B, K, 3) keypoints in
    heatmap pixel units, fusing forward + decode on device.

    use_fused: route the forward through the Pallas-fused inference path
    (models/fused_inference.py, +30% measured: 3,093 vs 2,372 img/s
    incl. decode at B=128 on v5e; the mobile variant routes the mobile
    kernels, +52% measured: 3,444 vs 2,260 img/s,
    scripts/bench_mobile_fused.py). "auto" = on TPU with a 2-byte
    compute dtype; the flax path is the fallback everywhere else.

    flip_test: test-time augmentation — ALSO forward the horizontally
    mirrored batch, un-mirror its heatmaps (width flip + left/right
    channel swap, see unflip_heatmaps), and decode the average of the
    two. The standard hourglass-family eval-accuracy lever (the
    reference evaluates single-view only, eval.py:106-108); it runs the
    forward twice, so expect ~half the eval throughput.

    mesh: optional jax.sharding.Mesh with a "data" axis — images shard
    over it (batch must be divisible by the axis size; predict_ds pads),
    params/stats replicate, and GSPMD data-parallelizes the forward +
    decode across chips (the same sharding PoseServer uses)."""
    from single_person_pose_estimation_tpu.models.fused_inference import (
        forward_last_stack,
    )

    flip_perm = _flip_permutation(model.num_classes, flip_pairs)

    def fn(params, batch_stats, images):
        if images.dtype == jnp.uint8:
            # uint8 wire (config.eval_transfer_dtype): 4x less
            # host->device traffic; normalize on device.
            images = images.astype(jnp.float32) / 255.0
        variables = {"params": params, "batch_stats": batch_stats}
        # Backend policy (fused vs flax, incl. the auto >256px fallback)
        # is shared with serving.PoseServer via forward_last_stack.
        hms = forward_last_stack(model, variables, images,
                                 use_fused=use_fused, auto=auto,
                                 interpret=interpret)
        if flip_test:
            hms_f = forward_last_stack(model, variables,
                                       images[:, :, ::-1, :],
                                       use_fused=use_fused, auto=auto,
                                       interpret=interpret)
            hms = 0.5 * (hms + unflip_heatmaps(hms_f, flip_perm,
                                               shift=flip_shift))
        if version == 1:
            dec = partial(decode_v1, conf_threshold=conf_threshold)
        else:
            dec = partial(_decode_v2, conf_threshold=conf_threshold,
                          legacy=legacy)
        return jax.vmap(dec)(hms)

    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data", None, None, None))
    return jax.jit(fn, in_shardings=(repl, repl, data),
                   out_shardings=repl)


def predict_ds(
    model,
    state,
    ds_prediction,
    conf_threshold: float = 1e-6,
    legacy_decode: bool = True,
    decode_version: int = 2,
    save_path: Optional[str] = "result.json",
    flip_test: bool = False,
    flip_pairs=DEFAULT_FLIP_PAIRS,
    mesh=None,
) -> List[dict]:
    """Iterate the prediction dataset; return the reference's prediction
    records (eval.py:110-141): per example the un-cropped predicted and GT
    keypoints, visibilities, confidences, ids, original bbox.

    `ds_prediction` yields (images [B, H, W, 3], metas list) — see
    DatasetBuilder.get_ds_prediction. Keypoints are normalized by the
    heatmap size then mapped through the stored square crop box.
    """
    fn = make_predict_decode_fn(model, conf_threshold, legacy_decode,
                                decode_version, flip_test=flip_test,
                                flip_pairs=flip_pairs, mesh=mesh)
    dsize = int(mesh.shape["data"]) if mesh is not None else 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        img_target = NamedSharding(mesh, P("data", None, None, None))
    else:
        img_target = None

    def _put(pair):
        # Runs on the DevicePrefetcher transfer thread: pad the (final
        # partial) batch to the data-axis size if meshed, then start the
        # host->device copy of batch N+1 while batch N's forward runs —
        # the wire is the eval bound on tunneled/wire-limited hosts
        # (PERF.md "Eval from records").
        images, metas = pair
        n = images.shape[0]
        if mesh is not None and n % dsize:
            pad = dsize - n % dsize
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:],
                                  images.dtype)], axis=0)
        return jax.device_put(images, img_target), metas, n

    from single_person_pose_estimation_tpu.data.device_prefetch import (
        DevicePrefetcher,
    )

    predictions: List[dict] = []
    # Tie the source's lifetime to the prefetcher (closed on the producer
    # thread when it exits) and ALWAYS close: an exception mid-eval must
    # not strand the transfer thread holding two device-resident batches
    # plus the decode pool.
    pf = DevicePrefetcher(iter(ds_prediction), depth=2, put_fn=_put,
                          on_stop=getattr(ds_prediction, "close", None))
    try:
        predictions = _predict_loop(pf, fn, state)
    finally:
        pf.close()

    if save_path:
        with open(save_path, "w") as f:
            json.dump(predictions, f)
    return predictions


def _predict_loop(pf, fn, state) -> List[dict]:
    predictions: List[dict] = []
    for images, metas, n in pf:
        kps = np.asarray(fn(state.params, state.batch_stats, images))[:n]
        # decode returns heatmap-space coords; normalize by heatmap dims
        # (the model's label resolution is input/4 by construction).
        hm_h = images.shape[1] // 4
        hm_w = images.shape[2] // 4
        for j, meta in enumerate(metas):
            xs_pred = kps[j, :, 0] / hm_w
            ys_pred = kps[j, :, 1] / hm_h
            confs = kps[j, :, 2]
            bw = int(meta["bbox_w"])
            bh = int(meta["bbox_h"])
            bx = float(meta["bbox_x"])
            by = float(meta["bbox_y"])
            # GT keypoints are stored in the crop's STORED frame, which is
            # the square bbox unless the record was written pre-resized
            # (record_image_size) — normalize by the frame, un-crop by the
            # true bbox (see _parse_prediction_example).
            fw = int(meta.get("frame_w", bw))
            fh = int(meta.get("frame_h", bh))
            xs_gt = np.asarray(meta["keypoints/x"], np.float64) / fw
            ys_gt = np.asarray(meta["keypoints/y"], np.float64) / fh

            predictions.append({
                "xs/pred": (xs_pred * bw + bx).astype(float).tolist(),
                "ys/pred": (ys_pred * bh + by).astype(float).tolist(),
                "xs/gt": (xs_gt * bw + bx).astype(float).tolist(),
                "ys/gt": (ys_gt * bh + by).astype(float).tolist(),
                "vs": np.asarray(meta["keypoints/vis"]).astype(int).tolist(),
                "confs": confs.astype(float).tolist(),
                "image_id": int(meta["image_id"]),
                "ann_id": int(meta["ann_id"]),
                "original_bbox": np.asarray(
                    meta["original_bbox"]).astype(float).tolist(),
            })

    return predictions
