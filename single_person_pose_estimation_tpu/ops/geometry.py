"""Bounding-box and crop geometry, as pure jit-able JAX functions.

Replicates the semantics of reference utilities/data_utils.py:
  - transform_bbox_square (data_utils.py:16-45)
  - crop_and_pad          (data_utils.py:48-98)
and eval.py's _undo_bbox (eval.py:153-158).

Unlike the reference (host-side tf.image pad/crop with Python ints, one image
at a time), the JAX versions are shape-static and vmappable: `crop_and_pad`
resamples via a gather with out-of-bounds masking, so a whole batch of crops
with different boxes compiles to one fused gather — no dynamic shapes, no
host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def transform_bbox_square(bbox, scale: float = 1.0):
    """Grow a (x, y, w, h) box to a square of side max(w, h) * scale, same center.

    Works on Python floats, numpy arrays, or traced JAX values; `bbox` may be
    a 4-tuple or an array whose last axis is 4 (batched).
    Reference: utilities/data_utils.py:16-45.
    """
    if isinstance(bbox, (tuple, list)):
        x, y, w, h = bbox
    else:
        bbox = jnp.asarray(bbox)
        x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    cx = x + w / 2
    cy = y + h / 2
    side = jnp.maximum(w, h) if not isinstance(w, (int, float)) else max(w, h)
    side = side * scale
    nx = cx - side / 2
    ny = cy - side / 2
    if isinstance(bbox, (tuple, list)):
        return nx, ny, side, side
    return jnp.stack([nx, ny, side, side], axis=-1)


def _bilinear_gather(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample image (H, W, C) at float coords (out_h, out_w); zero outside."""
    H, W = image.shape[0], image.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = image[yc, xc]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0i, x0i) * (1 - wx)[..., None] + tap(y0i, x0i + 1) * wx[..., None]
    bot = tap(y0i + 1, x0i) * (1 - wx)[..., None] + tap(y0i + 1, x0i + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


@partial(jax.jit, static_argnames=("out_height", "out_width"))
def crop_and_resize(
    image: jnp.ndarray,
    square_bbox: jnp.ndarray,
    out_height: int = 256,
    out_width: int = 256,
) -> jnp.ndarray:
    """Crop `image` to `square_bbox` (zero-padding outside the frame) and
    resize the crop to (out_height, out_width) in a single bilinear gather.

    Fuses the reference's crop_and_pad (data_utils.py:48-98) + tf.image.resize
    sequence (demo.py:52-53) into one device-side resample with static output
    shape — the TPU-native replacement for dynamic-shape pad/crop.

    tf.image.resize uses half-pixel centers; output pixel (i, j) samples the
    crop at ((j + 0.5) * w/out_w - 0.5, (i + 0.5) * h/out_h - 0.5).

    Args:
      image: (H, W, C) float array.
      square_bbox: (4,) array (x, y, w, h); may be fractional.
    """
    x, y, w, h = square_bbox[0], square_bbox[1], square_bbox[2], square_bbox[3]
    # The reference floors box coords to ints when cropping
    # (data_utils.py:95-96: int(max(ymin, 0)), int(h), int(w)).
    x = jnp.floor(x)
    y = jnp.floor(y)
    w = jnp.floor(w)
    h = jnp.floor(h)
    H, W = image.shape[0], image.shape[1]

    # Sample positions in *crop space*. tf.image.resize clamps its bilinear
    # taps to the crop bounds (edge replication) — because the reference
    # materializes the crop before resizing, out-of-crop content must NOT
    # leak in, so taps are clamped in crop space before mapping to image
    # space (where out-of-image taps read as zero padding).
    rows = (jnp.arange(out_height, dtype=jnp.float32) + 0.5) * (h / out_height) - 0.5
    cols = (jnp.arange(out_width, dtype=jnp.float32) + 0.5) * (w / out_width) - 0.5
    ys = jnp.broadcast_to(rows[:, None], (out_height, out_width))
    xs = jnp.broadcast_to(cols[None, :], (out_height, out_width))

    wy = ys - jnp.floor(ys)
    wx = xs - jnp.floor(xs)
    y0c = jnp.clip(jnp.floor(ys), 0, jnp.maximum(h - 1, 0)).astype(jnp.int32)
    y1c = jnp.clip(jnp.floor(ys) + 1, 0, jnp.maximum(h - 1, 0)).astype(jnp.int32)
    x0c = jnp.clip(jnp.floor(xs), 0, jnp.maximum(w - 1, 0)).astype(jnp.int32)
    x1c = jnp.clip(jnp.floor(xs) + 1, 0, jnp.maximum(w - 1, 0)).astype(jnp.int32)

    yi = y.astype(jnp.int32)
    xi = x.astype(jnp.int32)

    def tap(yc, xc):
        gy = yc + yi
        gx = xc + xi
        valid = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
        v = image[jnp.clip(gy, 0, H - 1), jnp.clip(gx, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0c, x0c) * (1 - wx)[..., None] + tap(y0c, x1c) * wx[..., None]
    bot = tap(y1c, x0c) * (1 - wx)[..., None] + tap(y1c, x1c) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def crop_and_pad(image: jnp.ndarray, square_bbox, out_size: Tuple[int, int]):
    """Reference-compatible crop: zero-pad so the box is valid, crop to it,
    then (because JAX needs static shapes) resize to `out_size`.

    The reference's crop_and_pad returns a crop of the box's own (dynamic)
    size which every caller immediately resizes to a fixed size
    (gen_tfrecords.py:29 stores it; demo.py:52-53 resizes to 256x256).
    Here the two steps are fused; see `crop_and_resize`.
    """
    square_bbox = jnp.asarray(square_bbox, dtype=jnp.float32)
    return crop_and_resize(image, square_bbox, out_size[0], out_size[1])


def undo_bbox(x, y, width, height, normalized_xs, normalized_ys):
    """Map crop-normalized keypoints back into original-image coordinates.

    Reference: eval.py:153-158.
    """
    return normalized_xs * width + x, normalized_ys * height + y


def keypoints_to_crop_frame(xs, ys, vs, bbox):
    """Shift COCO keypoints into the crop frame of `bbox` = (x, y, w, h),
    zeroing any keypoint outside the open box or invisible.

    Replicates gen_tfrecords.py:44-54: a keypoint survives iff
    0 < x - bx < w and 0 < y - by < h and v > 0; otherwise (x, y, v) = 0.
    Vectorized over the keypoint axis.
    """
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    vs = jnp.asarray(vs, jnp.int32)
    bx, by, bw, bh = bbox[0], bbox[1], bbox[2], bbox[3]
    sx = xs - bx
    sy = ys - by
    keep = (sx > 0) & (sx < bw) & (sy > 0) & (sy < bh) & (vs > 0)
    return (
        jnp.where(keep, sx, 0.0),
        jnp.where(keep, sy, 0.0),
        jnp.where(keep, vs, 0),
    )
