"""Pallas TPU kernel: fused hourglass UP-LEVEL (inference).

One decoder level of the hourglass (hourglass.py:143-157) is
    d = bottleneck_short(feat)            # skip branch at (H, W)
    u = d + upsample2x(u_lo)              # nearest 2x of the (H/2, W/2) map
    out = bottleneck_merged(u)
With separate ops, the intermediate d, the upsampled map and the sum all
round-trip HBM. This kernel computes the whole level per image in VMEM:
both bottlenecks (1x1 -> 3x3 as 9 shifted MXU matmuls -> 1x1 with folded
inference-BN affines and residual adds) plus the upsample+add, reading
feat and u_lo once and writing out once.

Companion to ops.pallas.bottleneck_kernel (same math per bottleneck);
used by models/fused_inference.py when fuse_levels=True.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bneck_body(x, w1_ref, w2_ref, w3_ref, b_ref, a_ref, c_ref, N, H, W, Cin,
                Cmid, dtype):
    """In-VMEM bottleneck on value x (N, H, W, Cin). b_ref (3, >=Cin)
    biases; a_ref/c_ref (3, >=Cin) BN affines (row i = stage i,
    channel-prefixed)."""
    xf = x.reshape(N * H * W, Cin)
    z1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a_ref[0:1, :Cmid] + c_ref[0:1, :Cmid]
    t1 = t1.astype(dtype).reshape(N, H, W, Cmid)
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cmid)
            acc = acc + jnp.dot(sl, w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b_ref[1:2, :Cmid], 0.0) * a_ref[1:2, :Cmid] \
        + c_ref[1:2, :Cmid]
    t2 = t2.astype(dtype)
    z3 = jnp.dot(t2, w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :Cin]
    t3 = jnp.maximum(z3, 0.0) * a_ref[2:3, :Cin] + c_ref[2:3, :Cin]
    return (xf.astype(jnp.float32) + t3).astype(dtype).reshape(N, H, W, Cin)


def _uplevel_kernel(feat_ref, ulo_ref,
                    sw1, sw2, sw3, sb, sa, sc,
                    mw1, mw2, mw3, mb, ma, mc,
                    out_ref, *, N, H, W, Cin, Cmid):
    dtype = feat_ref.dtype
    d = _bneck_body(feat_ref[...], sw1, sw2, sw3, sb, sa, sc,
                    N, H, W, Cin, Cmid, dtype)
    # nearest 2x upsample of the low-res map, in VMEM.
    ulo = ulo_ref[...]                                  # (N, H/2, W/2, Cin)
    up = jnp.broadcast_to(ulo[:, :, None, :, None, :],
                          (N, H // 2, 2, W // 2, 2, Cin)
                          ).reshape(N, H, W, Cin)
    s = (d.astype(jnp.float32) + up.astype(jnp.float32)).astype(dtype)
    out_ref[...] = _bneck_body(s, mw1, mw2, mw3, mb, ma, mc,
                               N, H, W, Cin, Cmid, dtype)


def _pack_params(b1, b2, b3, a1, c1, a2, c2, a3, c3, Cin, Cmid):
    n = max(Cin, Cmid)
    b = jnp.zeros((3, n), jnp.float32)
    b = b.at[0, :Cmid].set(b1).at[1, :Cmid].set(b2).at[2, :Cin].set(b3)
    a = jnp.zeros((3, n), jnp.float32)
    a = a.at[0, :Cmid].set(a1).at[1, :Cmid].set(a2).at[2, :Cin].set(a3)
    c = jnp.zeros((3, n), jnp.float32)
    c = c.at[0, :Cmid].set(c1).at[1, :Cmid].set(c2).at[2, :Cin].set(c3)
    return b, a, c


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_uplevel(feat, u_lo, short_params, merged_params,
                  interpret: bool = False, nimg: int = 0):
    """feat (B, H, W, C); u_lo (B, H/2, W/2, C).

    short_params / merged_params: dicts with w1 (C, Cm), b1, w2 (3,3,Cm,Cm),
    b2, w3 (Cm, C), b3, a1, c1, a2, c2, a3, c3 (folded BN affines).
    nimg: images per grid step (0 = auto; smaller target than the plain
    bottleneck — two fused bottlenecks' temporaries share the VMEM budget).
    """
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
        resolve_nimg,
    )

    B, H, W, Cin = feat.shape
    Cmid = short_params["w1"].shape[1]
    dt = feat.dtype
    N = resolve_nimg(nimg, B, H, W, target_rows=2048)

    def prep(p):
        b, a, c = _pack_params(p["b1"], p["b2"], p["b3"], p["a1"], p["c1"],
                               p["a2"], p["c2"], p["a3"], p["c3"], Cin, Cmid)
        return (p["w1"].astype(dt), p["w2"].astype(dt), p["w3"].astype(dt),
                b, a, c)

    sp = prep(short_params)
    mp = prep(merged_params)

    kernel = partial(_uplevel_kernel, N=N, H=H, W=W, Cin=Cin, Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, H // 2, W // 2, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        interpret=interpret,
    )(feat, u_lo, *sp, *mp)
