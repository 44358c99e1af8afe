"""On-device Gaussian heatmap target rendering.

Replaces the reference's host-side per-keypoint Python loop
(dataset_builder.py:220-238 `np_gen_heatmaps` + utilities/data_utils.py:187-211
`gaussian`, itself taken from princeton-vl/pose-hg-train) with one vectorized,
jit-able formula evaluated for all keypoints of all examples at once.

Exact reference semantics reproduced:
  * keypoint coords are truncated to int (``int(kps_x[i])``);
  * a keypoint renders iff ``0 < x < W`` and ``0 < y < H`` and ``v > 0``
    (note the strict ``0 <`` — column/row 0 never hosts a peak);
  * the stamp is the *unnormalized* Gaussian ``exp(-(dx^2+dy^2)/(2 sigma^2))``
    restricted to the square window ``|dx| <= 3 sigma``, ``|dy| <= 3 sigma``
    (window size ``6 sigma + 1``), zero elsewhere;
  * the reference then divides by the max; since the peak (value 1.0) is
    always inside the map under the validity condition, that division is an
    exact no-op, so it is omitted here.

Because the center pixel is guaranteed in-bounds, the reference's partial
out-of-bounds window clipping reduces to plain masking — the closed-form
used below is bit-identical (verified in tests against an independent
numpy re-derivation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width", "sigma"))
def render_heatmaps(
    kps_x: jnp.ndarray,
    kps_y: jnp.ndarray,
    kps_v: jnp.ndarray,
    height: int = 64,
    width: int = 64,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Render per-keypoint Gaussian heatmaps for a single example.

    Args:
      kps_x, kps_y: (K,) float keypoint coordinates in heatmap space.
      kps_v: (K,) visibility flags; keypoint renders iff > 0.
      height, width: heatmap spatial dims.
      sigma: Gaussian sigma (reference default 1).

    Returns:
      (height, width, K) float32 heatmaps with peak value exactly 1.0.
    """
    kps_x = jnp.asarray(kps_x, jnp.float32)
    kps_y = jnp.asarray(kps_y, jnp.float32)
    kps_v = jnp.asarray(kps_v)

    # int() truncates toward zero — match with astype(int32) (also
    # truncating) after a trunc() to be explicit about negatives.
    xi = jnp.trunc(kps_x).astype(jnp.int32)
    yi = jnp.trunc(kps_y).astype(jnp.int32)

    valid = (xi > 0) & (xi < width) & (yi > 0) & (yi < height) & (kps_v > 0)

    radius = int(3 * sigma)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    # (H, W, K) distances from each keypoint center.
    dx = xs[:, :, None] - xi[None, None, :]
    dy = ys[:, :, None] - yi[None, None, :]
    in_window = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
    g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                / (2.0 * sigma * sigma))
    hm = jnp.where(in_window & valid[None, None, :], g, 0.0)
    return hm.astype(jnp.float32)


@partial(jax.jit, static_argnames=("height", "width", "sigma"))
def render_heatmaps_batch(
    kps_x: jnp.ndarray,
    kps_y: jnp.ndarray,
    kps_v: jnp.ndarray,
    height: int = 64,
    width: int = 64,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Batched heatmap rendering: (B, K) coords -> (B, H, W, K) heatmaps."""
    fn = partial(render_heatmaps, height=height, width=width, sigma=sigma)
    return jax.vmap(fn)(kps_x, kps_y, kps_v)
