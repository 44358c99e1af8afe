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
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu.ops.decode import _decode_v2, decode_v1


def make_predict_decode_fn(model, conf_threshold: float = 1e-6,
                           legacy: bool = True, version: int = 2,
                           use_fused="auto", interpret: bool = False):
    """Jitted (params, batch_stats, images) -> (B, K, 3) keypoints in
    heatmap pixel units, fusing forward + decode on device.

    use_fused: route the forward through the Pallas-fused inference path
    (models/fused_inference.py, +30% measured: 3,093 vs 2,372 img/s
    incl. decode at B=128 on v5e; the mobile variant routes the mobile
    kernels, +52% measured: 3,444 vs 2,260 img/s,
    scripts/bench_mobile_fused.py). "auto" = on TPU with a 2-byte
    compute dtype; the flax path is the fallback everywhere else."""
    auto = use_fused == "auto"
    mobile = bool(getattr(model, "mobile", False))
    if auto:
        # 2-byte compute dtypes only: the fused kernels' VMEM blocking is
        # tuned for bf16 — at f32 the 64px level exceeds the 16 MB scoped
        # VMEM limit (measured on v5e; scripts/validate_fused_tpu.py).
        use_fused = (jax.default_backend() == "tpu"
                     and jnp.dtype(model.compute_dtype).itemsize == 2)

    @jax.jit
    def fn(params, batch_stats, images):
        variables = {"params": params, "batch_stats": batch_stats}
        # At 512^2 inputs the fused path measured -12% vs XLA (the extra
        # 128px level stays on XLA above fuse_max_h and the fusable tail
        # shrinks; scripts/sweep_fused_generalization.py) — auto falls
        # back to the flax path there. Explicit use_fused=True overrides.
        if use_fused and not (auto and images.shape[1] > 256):
            from single_person_pose_estimation_tpu.models.fused_inference import (
                fused_apply,
            )
            hms = fused_apply(variables, images,
                              num_stacks=model.num_stacks,
                              compute_dtype=model.compute_dtype,
                              fuse_levels=True, pool_fuse_max_h=32,
                              fuse_heads=True, mobile=mobile,
                              interpret=interpret)[-1]
        else:
            hms = model.apply(variables, images, train=False)[-1]
        if version == 1:
            dec = partial(decode_v1, conf_threshold=conf_threshold)
        else:
            dec = partial(_decode_v2, conf_threshold=conf_threshold,
                          legacy=legacy)
        return jax.vmap(dec)(hms)

    return fn


def predict_ds(
    model,
    state,
    ds_prediction,
    conf_threshold: float = 1e-6,
    legacy_decode: bool = True,
    decode_version: int = 2,
    save_path: Optional[str] = "result.json",
) -> List[dict]:
    """Iterate the prediction dataset; return the reference's prediction
    records (eval.py:110-141): per example the un-cropped predicted and GT
    keypoints, visibilities, confidences, ids, original bbox.

    `ds_prediction` yields (images [B, H, W, 3], metas list) — see
    DatasetBuilder.get_ds_prediction. Keypoints are normalized by the
    heatmap size then mapped through the stored square crop box.
    """
    fn = make_predict_decode_fn(model, conf_threshold, legacy_decode,
                                decode_version)
    predictions: List[dict] = []
    for images, metas in ds_prediction:
        kps = np.asarray(fn(state.params, state.batch_stats,
                            jnp.asarray(images)))
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
            xs_gt = np.asarray(meta["keypoints/x"], np.float64) / bw
            ys_gt = np.asarray(meta["keypoints/y"], np.float64) / bh

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

    if save_path:
        with open(save_path, "w") as f:
            json.dump(predictions, f)
    return predictions
