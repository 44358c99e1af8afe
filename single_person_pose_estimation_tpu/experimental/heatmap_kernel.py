"""Pallas TPU kernel: batched Gaussian heatmap target rendering.

Computes the same function as ops.heatmap.render_heatmaps_batch — for each
(example, keypoint), an unnormalized Gaussian stamped on a +-3*sigma window
at the truncated keypoint position (reference dataset_builder.py:220-238
semantics) — as a single Pallas kernel gridded over the batch. The whole
(H, W, K) tile is produced in VMEM from broadcasted iotas; no HBM
intermediates, no gather/scatter.

Measured on TPU v5e (B=128): bit-identical to the XLA version; XLA's fused
lowering is ~20% faster (9.4ms vs 12.0ms per call including dispatch) —
the K=17 channel axis pads to 128 lanes in this kernel's layout, wasting
lane bandwidth, while XLA picks its own layout. The XLA implementation
therefore remains the default; this kernel is kept as the hand-written
alternative (select via ops.pallas). Tests run it in interpreter mode on
CPU against the XLA implementation; it compiles and runs natively on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _render_kernel(kx_ref, ky_ref, kv_ref, out_ref, *, height, width, sigma):
    # Refs: kx/ky/kv full (B, K) in VMEM (tiny; TPU block rules disallow
    # 1-row blocks of a 2D array); out (1, H, W, K) for this example.
    # All intermediates stay >= 2D with K as the minor (lane) dim — Mosaic
    # cannot insert a minor dim on sub-32-bit (bool) vectors.
    b = pl.program_id(0)
    row = pl.ds(b, 1)
    kx = kx_ref[row, :]                      # (1, K) f32
    ky = ky_ref[row, :]
    kv = kv_ref[row, :]                      # (1, K) i32
    xi = jnp.trunc(kx).astype(jnp.int32)
    yi = jnp.trunc(ky).astype(jnp.int32)

    K = kx.shape[1]
    radius = int(3 * sigma)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width, K), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width, K), 1)
    # Broadcast the per-keypoint i32 scalars to the full tile FIRST so every
    # boolean lives at (H, W, K); Mosaic cannot reshape small i1 vectors.
    xi3 = jnp.broadcast_to(xi.reshape(1, 1, K), (height, width, K))
    yi3 = jnp.broadcast_to(yi.reshape(1, 1, K), (height, width, K))
    kv3 = jnp.broadcast_to(kv.reshape(1, 1, K), (height, width, K))
    dx = xs - xi3
    dy = ys - yi3
    ok = ((xi3 > 0) & (xi3 < width) & (yi3 > 0) & (yi3 < height)
          & (kv3 > 0) & (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius))
    g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                / (2.0 * sigma * sigma))
    out_ref[0] = jnp.where(ok, g, 0.0)


@partial(jax.jit, static_argnames=("height", "width", "sigma", "interpret"))
def render_heatmaps_batch_pallas(kx, ky, kv, height: int = 64,
                                 width: int = 64, sigma: float = 1.0,
                                 interpret: bool = False):
    """(B, K) keypoints -> (B, H, W, K) float32 heatmaps via Pallas."""
    B, K = kx.shape
    kv = kv.astype(jnp.int32)
    kernel = partial(_render_kernel, height=height, width=width, sigma=sigma)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, height, width, K), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, height, width, K), jnp.float32),
        interpret=interpret,
    )(kx.astype(jnp.float32), ky.astype(jnp.float32), kv)
