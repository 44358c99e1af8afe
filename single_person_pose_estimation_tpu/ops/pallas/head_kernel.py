"""Pallas TPU kernel: fused hourglass head + inter-stack glue (inference).

Per stack the reference computes (hourglass.py:71-93):
    head = bn(relu(u @ Wh + bh))            # 1x1, C -> C
    pred = sigmoid(head @ Wp + bp)          # 1x1, C -> K heatmaps
    h2   = head @ W2 + b2                   # 1x1, C -> C   (next-stack)
    hm   = pred @ W3 + b3                   # 1x1, K -> C   (next-stack)
    y'   = h2 + hm + y                      # inter-stack residual
As separate XLA ops this chain moves ~16 MB/image of HBM traffic per
stack (each 1x1 conv is an HBM->HBM round trip of a 64x64x256 map); the
fused kernel reads u and y once and writes pred and y' once (~7 MB).
All convs are 1x1 so blocks can split spatial rows with no halo — each
grid step handles ROWS sublines of one image, keeping VMEM small enough
for Mosaic's double-buffered pipeline.

The K=17 prediction lane is zero-padded to 128 for the MXU; the padded
sigmoid columns are masked back to zero before the K -> C matmul
(sigmoid(0) = 0.5 would otherwise leak into hm). The last stack (no
next-stack glue, hourglass.py:91) uses a separate program without the
y input / y' output.

Inference-only; used by models/fused_inference.py. Equality-tested
against model.apply in tests/test_fused_inference.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _head_common(u, wh_ref, wp_ref, b_ref, ac_ref, ROWS, W, C, K):
    uf = u.reshape(ROWS * W, C)
    zh = jnp.dot(uf, wh_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :C]
    head = jnp.maximum(zh, 0.0) * ac_ref[0:1, :C] + ac_ref[1:2, :C]
    head = head.astype(u.dtype)
    zp = jnp.dot(head, wp_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[1:2, :_LANES]
    col = jax.lax.broadcasted_iota(jnp.int32, zp.shape, 1)
    pred = jnp.where(col < K, jax.nn.sigmoid(zp), 0.0)   # mask padded lanes
    return head, pred


def _head_mid_kernel(u_ref, y_ref, wh_ref, wp_ref, w2_ref, w3_ref,
                     b_ref, ac_ref, pred_ref, ynext_ref, *, ROWS, W, C, K):
    u = u_ref[...]                                   # (1, ROWS, W, C)
    head, pred = _head_common(u, wh_ref, wp_ref, b_ref, ac_ref,
                              ROWS, W, C, K)
    pred_ref[...] = pred[:, :K].reshape(1, ROWS, W, K)
    h2 = jnp.dot(head, w2_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :C]
    hm = jnp.dot(pred.astype(u.dtype), w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[3:4, :C]
    yf = y_ref[...].reshape(ROWS * W, C)
    # Match the XLA path's dtype flow: each conv output rounds to the
    # compute dtype before the residual adds.
    ynext = (h2.astype(u.dtype) + hm.astype(u.dtype) + yf)
    ynext_ref[...] = ynext.reshape(1, ROWS, W, C)


def _head_last_kernel(u_ref, wh_ref, wp_ref, b_ref, ac_ref, pred_ref, *,
                      ROWS, W, C, K):
    u = u_ref[...]
    _, pred = _head_common(u, wh_ref, wp_ref, b_ref, ac_ref, ROWS, W, C, K)
    pred_ref[...] = pred[:, :K].reshape(1, ROWS, W, K)


@partial(jax.jit, static_argnames=("last", "rows", "interpret"))
def fused_head(u, y, wh, bh, a, c, wp, bp, w2=None, b2=None, w3=None,
               b3=None, last: bool = False, rows: int = 16,
               interpret: bool = False):
    """u (B, H, W, C) decoder output; y (B, H, W, C) stack input (ignored
    when last=True). a/c: folded inference-BN affine of the head conv.
    w2/b2/w3/b3: next-stack glue convs — absent on the last stack (the
    reference prunes them, pinned by the param-count test).
    Returns (pred (B, H, W, K) f32, y_next (B, H, W, C) or None)."""
    B, H, W, C = u.shape
    K = wp.shape[1]
    dt = u.dtype
    ROWS = min(rows, H)

    TW = max(C, _LANES)   # table width: bias rows serve both C and K lanes
    wp_pad = jnp.zeros((C, _LANES), dt).at[:, :K].set(wp.astype(dt))
    b_tab = jnp.zeros((4, TW), jnp.float32)
    b_tab = b_tab.at[0, :C].set(bh.astype(jnp.float32))
    b_tab = b_tab.at[1, :K].set(bp.astype(jnp.float32))
    ac = jnp.zeros((2, TW), jnp.float32)
    ac = ac.at[0, :C].set(a.astype(jnp.float32))
    ac = ac.at[1, :C].set(c.astype(jnp.float32))
    if not last:
        w3_pad = jnp.zeros((_LANES, C), dt).at[:K, :].set(w3.astype(dt))
        b_tab = b_tab.at[2, :C].set(b2.astype(jnp.float32))
        b_tab = b_tab.at[3, :C].set(b3.astype(jnp.float32))

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = lambda ch: pl.BlockSpec((1, ROWS, W, ch),
                                  lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)
    grid = (B, H // ROWS)
    if last:
        kernel = partial(_head_last_kernel, ROWS=ROWS, W=W, C=C, K=K)
        pred = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk(C), full(), full(), full(), full()],
            out_specs=blk(K),
            out_shape=jax.ShapeDtypeStruct((B, H, W, K), jnp.float32),
            interpret=interpret,
        )(u, wh.astype(dt), wp_pad, b_tab, ac)
        return pred, None

    kernel = partial(_head_mid_kernel, ROWS=ROWS, W=W, C=C, K=K)
    pred, ynext = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(C), blk(C), full(), full(), full(), full(),
                  full(), full()],
        out_specs=(blk(K), blk(C)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, K), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W, C), dt),
        ),
        interpret=interpret,
    )(u, y, wh.astype(dt), wp_pad, w2.astype(dt), w3_pad, b_tab, ac)
    return pred, ynext
