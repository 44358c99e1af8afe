"""On-device, jit-compiled data augmentation.

TPU-native replacement for the reference's host-side augmentation
(dataset_builder.py:154-217), which ran imgaug through ``tf.numpy_function``
— a per-example TF->Python process boundary the reference itself flags as
slow (dataset_builder.py:146). Here the whole batch is augmented in one
fused XLA program with per-example `jax.random` keys (no global RNG — the
reference reseeds imgaug's global RNG inside a parallel map, a data race
we deliberately do not reproduce).

Geometric augmentation (reference np_augment_1, dataset_builder.py:154-199):
  * random horizontal flip (p=0.5) with left/right keypoint label swapping
    via the COCO flip pairs (flip_labels, dataset_builder.py:271-301);
  * affine scale U(0.75, 1.25) and rotation U(-30deg, 30deg) about the image
    center, bilinear, zero fill — imgaug Affine conventions: one scale for
    both axes, rotation center at (size/2 - 0.5).
  The image is warped in 256-space (center 127.5) and keypoints transformed
  in 64-heatmap-space (center 31.5), mirroring the reference which applies
  the same sampled parameters independently in each space.

Photometric augmentation (reference augment_2, dataset_builder.py:204-217):
  brightness delta U(-0.2, 0.2); contrast U(0.5, 2) about the per-channel
  mean; saturation U(0.75, 1.25); hue delta U(-0.1, 0.1); then a min-max
  renormalization of the whole image to [0, 1] (the reference's "clip").

All functions take an explicit PRNG key and are shape-static.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_FLIP_PAIRS: Tuple[Tuple[int, int], ...] = (
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16),
)


def _flip_permutation(num_keypoints: int, flip_pairs) -> jnp.ndarray:
    perm = list(range(num_keypoints))
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.asarray(perm, dtype=jnp.int32)


def _affine_params(key: jax.Array, scale_min, scale_max, rotate_deg):
    k1, k2, k3 = jax.random.split(key, 3)
    s = jax.random.uniform(k1, (), minval=scale_min, maxval=scale_max)
    theta = jax.random.uniform(
        k2, (), minval=-rotate_deg, maxval=rotate_deg) * (jnp.pi / 180.0)
    flip = jax.random.bernoulli(k3, 0.5)
    return s, theta, flip


def _warp_image(image: jnp.ndarray, s, theta, flip) -> jnp.ndarray:
    """Inverse-warp `image` (H, W, C) by flip -> scale -> rotate about center."""
    H, W = image.shape[0], image.shape[1]
    cy = (H - 1) / 2.0
    cx = (W - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    # Output pixel p_out = A p_in  =>  p_in = A^{-1} p_out.
    # A = R(theta) * s * F  =>  A^{-1} = F * (1/s) * R(-theta).
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    inv_s = 1.0 / s
    src_x = inv_s * (cos_t * xs + sin_t * ys)
    src_y = inv_s * (-sin_t * xs + cos_t * ys)
    src_x = jnp.where(flip, -src_x, src_x)
    src_x = src_x + cx
    src_y = src_y + cy

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = image[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0i, x0i) * (1 - wx)[..., None] + tap(y0i, x0i + 1) * wx[..., None]
    bot = tap(y0i + 1, x0i) * (1 - wx)[..., None] + tap(y0i + 1, x0i + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _transform_keypoints(kps_x, kps_y, kps_v, s, theta, flip,
                         label_size: int, flip_perm: jnp.ndarray):
    """Forward-transform keypoints in heatmap space; swap flip pairs on flip."""
    c = label_size / 2.0 - 0.5  # imgaug rotation center: size/2 - 0.5
    x = kps_x - c
    y = kps_y - c
    # Flip first (reference flips, swaps labels, then applies the affine).
    x = jnp.where(flip, -x, x)
    fx = jnp.where(flip, x[flip_perm], x)
    fy = jnp.where(flip, y[flip_perm], y)
    fv = jnp.where(flip, kps_v[flip_perm], kps_v)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    nx = s * (cos_t * fx - sin_t * fy) + c
    ny = s * (sin_t * fx + cos_t * fy) + c
    # Invisible keypoints pin to (0, 0) (reference np_augment_1 lines 190-196).
    vis = fv > 0
    return jnp.where(vis, nx, 0.0), jnp.where(vis, ny, 0.0), fv


@partial(jax.jit, static_argnames=("label_size", "flip_pairs"))
def augment_geometric(
    key: jax.Array,
    image: jnp.ndarray,
    kps_x: jnp.ndarray,
    kps_y: jnp.ndarray,
    kps_v: jnp.ndarray,
    label_size: int = 64,
    flip_pairs: Tuple[Tuple[int, int], ...] = DEFAULT_FLIP_PAIRS,
    scale_min: float = 0.75,
    scale_max: float = 1.25,
    rotate_deg: float = 30.0,
):
    """Single-example fused flip+scale+rotate for image and keypoints.

    The keypoint count is taken from `kps_x.shape[0]`; every index in
    `flip_pairs` must be in range.
    """
    num_keypoints = kps_x.shape[0]
    if flip_pairs and max(max(p) for p in flip_pairs) >= num_keypoints:
        raise ValueError(
            f"flip_pairs index out of range for {num_keypoints} keypoints")
    s, theta, flip = _affine_params(key, scale_min, scale_max, rotate_deg)
    perm = _flip_permutation(num_keypoints, flip_pairs)
    out_img = _warp_image(image, s, theta, flip)
    ox, oy, ov = _transform_keypoints(kps_x, kps_y, kps_v, s, theta, flip,
                                      label_size, perm)
    return out_img, ox, oy, ov


# ---------------------------------------------------------------------------
# Photometric augmentation (tf.image-equivalent, pure JAX)
# ---------------------------------------------------------------------------

def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rng = maxc - minc
    safe_rng = jnp.where(rng == 0, 1.0, rng)
    s = jnp.where(maxc == 0, 0.0, rng / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_rng
    gc = (maxc - g) / safe_rng
    bc = (maxc - b) / safe_rng
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(rng == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


@partial(jax.jit, static_argnames=())
def augment_photometric(
    key: jax.Array,
    image: jnp.ndarray,
    brightness: float = 0.2,
    contrast_min: float = 0.5,
    contrast_max: float = 2.0,
    saturation_min: float = 0.75,
    saturation_max: float = 1.25,
    hue: float = 0.1,
) -> jnp.ndarray:
    """Brightness/contrast/saturation/hue jitter + min-max renorm to [0, 1].

    Matches the op sequence and semantics of reference augment_2
    (dataset_builder.py:204-217): tf.image.random_brightness adds a uniform
    delta; random_contrast scales about the per-channel spatial mean;
    saturation/hue go through HSV. The final min-max rescale (not a clip,
    despite the reference's comment) maps the whole image to exactly [0, 1].
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    delta = jax.random.uniform(k1, (), minval=-brightness, maxval=brightness)
    image = image + delta

    c = jax.random.uniform(k2, (), minval=contrast_min, maxval=contrast_max)
    mean = jnp.mean(image, axis=(-3, -2), keepdims=True)  # per-channel mean
    image = (image - mean) * c + mean

    sat = jax.random.uniform(k3, (), minval=saturation_min, maxval=saturation_max)
    hsv = rgb_to_hsv(jnp.clip(image, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * sat, 0.0, 1.0))
    hdelta = jax.random.uniform(k4, (), minval=-hue, maxval=hue)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hdelta) % 1.0)
    image = hsv_to_rgb(hsv)

    max_val = jnp.max(image)
    min_val = jnp.min(image)
    # eps guards the constant-image case (black frame / dead camera): the
    # reference divides by zero here (dataset_builder.py:214-217) and emits
    # NaNs into training; that is a flaw, not parity-visible semantics.
    return (image - min_val) / jnp.maximum(max_val - min_val, 1e-6)


@partial(jax.jit, static_argnames=("label_size", "flip_pairs",
                                   "geometric_backend"))
def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,
    kps_x: jnp.ndarray,
    kps_y: jnp.ndarray,
    kps_v: jnp.ndarray,
    label_size: int = 64,
    flip_pairs: Tuple[Tuple[int, int], ...] = DEFAULT_FLIP_PAIRS,
    geometric_backend: str = "gather",
    scale_min: float = 0.75,
    scale_max: float = 1.25,
    rotate_deg: float = 30.0,
):
    """Full train-time augmentation for a batch: geometric + photometric.

    images: (B, H, W, 3) in [0, 1]; kps_*: (B, K). Returns augmented images
    and transformed keypoints. One fused XLA program; per-example keys.

    geometric_backend:
      * "gather"     — direct 4-tap bilinear warp (exact single-resample
                       interpolation; gathers are slow on TPU);
      * "matmul2pass"— gather-free 2-pass one-hot-matmul warp
                       (ops.pallas.warp_kernel; ~5x faster on TPU v5e,
                       interpolation differs only by the second linear
                       smoothing pass — statistically equivalent for
                       augmentation). Keypoint transforms and parameter
                       sampling are IDENTICAL across backends.
    """
    B = images.shape[0]
    k_geo, k_photo = jax.random.split(key)
    geo_keys = jax.random.split(k_geo, B)
    photo_keys = jax.random.split(k_photo, B)

    # Per-example affine params (same stream for both backends).
    params = jax.vmap(partial(_affine_params, scale_min=scale_min,
                              scale_max=scale_max, rotate_deg=rotate_deg)
                      )(geo_keys)
    s, theta, flip = params

    perm = _flip_permutation(kps_x.shape[1], flip_pairs)
    if flip_pairs and max(max(p) for p in flip_pairs) >= kps_x.shape[1]:
        raise ValueError("flip_pairs index out of range")
    ox, oy, ov = jax.vmap(
        lambda kx, ky, kv, ss, th, fl: _transform_keypoints(
            kx, ky, kv, ss, th, fl, label_size, perm)
    )(kps_x, kps_y, kps_v, s, theta, flip)

    if geometric_backend == "gather":
        imgs = jax.vmap(_warp_image)(images, s, theta, flip)
    elif geometric_backend == "matmul2pass":
        from single_person_pose_estimation_tpu.ops.pallas.warp_kernel import (
            affine_warp_batch,
        )
        imgs = affine_warp_batch(images, theta, s, flip)
    else:
        raise ValueError(f"unknown geometric_backend {geometric_backend!r}")

    imgs = jax.vmap(augment_photometric)(photo_keys, imgs)
    return imgs, ox, oy, ov
