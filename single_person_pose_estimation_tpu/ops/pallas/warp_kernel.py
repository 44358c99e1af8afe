"""Pallas TPU kernel: gather-free affine image warp (2-pass one-hot matmul).

Motivation (measured on v5e, B=64 256x256x3): the straightforward bilinear
warp is a 4-tap gather — 250-295 ms/batch, utterly gather-bound; the same
warp as an XLA blocked one-hot matmul is 177 ms (weight tensors round-trip
HBM); this kernel generates the interpolation weights IN VMEM and feeds the
MXU directly, eliminating that traffic.

Math: the affine inverse map decomposes (Catmull-Smith 2-pass) into two
1-D resamples, each with a per-line offset and a line-independent slope:

    pass 1 (along x, per row y):   pos = a1 * x' + off1[y]
    pass 2 (along y, per col x'):  pos = a2 * y' + off2[x']

Each 1-D resample of line L at positions pos is L @ Wt with
Wt[k, x'] = max(0, 1 - |pos[x'] - k|) — a 2-banded interpolation matrix
generated from iotas in VMEM. One (C, K) @ (K, W') matmul per line; blk
lines per grid step. Out-of-range positions get all-zero weights, i.e.
zero padding, matching the direct warp's boundary behavior.

The composition of two linear interpolations differs from one bilinear
resample by at most an extra smoothing of the half-pixel diagonal terms —
irrelevant for augmentation (SURVEY.md: statistical equivalence), and the
keypoint co-transform (ops.augment) is unchanged and exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resample_kernel(params_ref, img_ref, out_ref, *, blk, K, Wp):
    """Resample along the last axis for one (image, line-block) grid step.

    params_ref: (B, 3) f32 (VMEM, full) — per image (slope, line_coef,
                line_const): sample position for line l, output column x' is
                slope*x' + line_coef*l + line_const. The per-line offset is
                affine in the line index for every pass of an affine warp,
                so it is regenerated in-kernel from scalars (Mosaic cannot
                dynamically slice the lane dim of a (B, L) offset table).
    img_ref:    (1, C, blk, K) — this block's input lines
    out_ref:    (1, C, blk, Wp)
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    a = params_ref[b, 0]
    coef = params_ref[b, 1]
    const = params_ref[b, 2]

    lines = (h * blk
             + jax.lax.broadcasted_iota(jnp.int32, (blk, Wp), 0)
             ).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (blk, Wp), 1).astype(jnp.float32)
    pos = a * xs + coef * lines + const                      # (blk, Wp)
    ks = jax.lax.broadcasted_iota(jnp.int32, (blk, K, Wp), 1).astype(jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos.reshape(blk, 1, Wp) - ks))

    img = img_ref[0]                                         # (C, blk, K)
    C = img.shape[0]

    # Static Python loop: line indices must be concrete (Mosaic has no
    # dynamic_slice on VMEM values), and blk is small.
    for y in range(blk):
        # (C, K) @ (K, Wp): C on sublanes, Wp on lanes — small-M fast path.
        out = jax.lax.dot_general(
            img[:, y, :], w[y],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, :, y, :] = out


@partial(jax.jit, static_argnames=("blk", "interpret"))
def resample_last_axis(img_bchk, slope, line_coef, line_const, blk: int = 16,
                       interpret: bool = False):
    """out[b,c,l,x'] = linear interp of img[b,c,l,:] at
    slope[b]*x' + line_coef[b]*l + line_const[b]; zero outside.
    img (B, C, L, K) f32 -> (B, C, L, K)."""
    B, C, L, K = img_bchk.shape
    params = jnp.stack([slope, line_coef, line_const],
                       axis=-1).astype(jnp.float32)          # (B, 3)
    kernel = partial(_resample_kernel, blk=blk, K=K, Wp=K)
    return pl.pallas_call(
        kernel,
        grid=(B, L // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # params (B, 3)
            pl.BlockSpec((1, C, blk, K), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, blk, K), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, L, K), jnp.float32),
        interpret=interpret,
    )(params, img_bchk.astype(jnp.float32))


@partial(jax.jit, static_argnames=("interpret",))
def affine_warp_batch(images, theta, scale, flip, interpret: bool = False):
    """Batched inverse-affine warp (flip -> scale -> rotate about center),
    equivalent to the gather-based warp in ops.augment but gather-free.

    images: (B, H, W, C) f32 (H == W required by the shared-axis resampler);
    theta (B,) radians; scale (B,); flip (B,) bool. Returns (B, H, W, C).
    """
    B, H, W, C = images.shape
    if H != W:
        raise ValueError("2-pass warp currently requires square images")
    ct, st = jnp.cos(theta), jnp.sin(theta)
    p, q = ct / scale, st / scale          # src_x = p x' + q y' + alpha
    r, t = -st / scale, ct / scale         # src_y = r x' + t y' + beta
    c = (H - 1) / 2.0
    alpha = c - p * c - q * c
    beta = c - r * c - t * c

    # Pass 1 along x: pos = a1 x' + (q/t) y + const1.
    a1 = p - q * r / t
    coef1 = q / t
    const1 = alpha - q * beta / t
    # Horizontal flip folds into pass 1: pos -> (W-1) - pos.
    a1 = jnp.where(flip, -a1, a1)
    coef1 = jnp.where(flip, -coef1, coef1)
    const1 = jnp.where(flip, (W - 1) - const1, const1)

    # Pass 2 along y: pos = t y' + r x' + beta (lines are columns x').
    a2 = t
    coef2 = r
    const2 = beta

    x = jnp.transpose(images, (0, 3, 1, 2))                      # (B,C,H,W)
    x = resample_last_axis(x, a1, coef1, const1, interpret=interpret)
    x = jnp.transpose(x, (0, 1, 3, 2))                           # (B,C,W,H)
    x = resample_last_axis(x, a2, coef2, const2, interpret=interpret)
    x = jnp.transpose(x, (0, 1, 3, 2))
    return jnp.transpose(x, (0, 2, 3, 1))
