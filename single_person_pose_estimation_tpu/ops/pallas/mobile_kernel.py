"""Pallas TPU kernels: fully-fused MOBILE (separable-conv) hourglass
bottleneck / pool / up-level, inference.

The mobile variant (reference hourglass.py:209-231) swaps every bottleneck
conv for SeparableConv2D = depthwise k x k (no bias) -> pointwise 1x1
(+bias), then relu -> BN as usual. On XLA the depthwise convs bypass the
MXU and leave the model HBM/VPU-bound: measured 2,241-2,329 img/s vs
3,100 for the 2.4x-FLOPs standard model (PERF.md "Mobile variant"). These
kernels apply the same whole-map-in-VMEM strategy as the standard
bottleneck/uplevel kernels, exploiting separable structure:

  * the 1x1 depthwise kernels are per-channel SCALES — folded into the
    following pointwise matmul weights outside the kernel (zero cost);
  * the 3x3 depthwise is 9 shifted VPU multiply-accumulates with
    per-channel taps (no MXU work at all), accumulated in f32 — exact;
  * the three pointwise convs are the MXU matmuls.

Identity-skip only (all hourglass-stack bottlenecks; the front module's
channel-changing bottlenecks stay on XLA, as in the standard fused path).
Consumes the flax SeparableConv parameter layout (depthwise grouped-conv
kernel (k,k,1,C), pointwise (1,1,C,Cout) + bias) via mobile_bneck_params.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
    resolve_nimg,
)


def _mobile_body(x, w1_ref, d2_ref, w2_ref, w3_ref, b_ref, a_ref, c_ref,
                 N, H, W, Cin, Cmid, dtype):
    """In-VMEM mobile bottleneck on value x (N, H, W, Cin). b/a/c refs are
    (3, >=Cin) stage-rowed tables; w1/w3 carry the folded 1x1 depthwise
    scales; d2_ref (9, Cmid) holds the 3x3 depthwise taps."""
    xf = x.reshape(N * H * W, Cin)
    z1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a_ref[0:1, :Cmid] + c_ref[0:1, :Cmid]
    t1 = t1.astype(dtype).reshape(N, H, W, Cmid)

    # depthwise 3x3: 9 shifted per-channel multiply-accumulates (VPU).
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cmid)
            acc = acc + sl.astype(jnp.float32) * d2_ref[3 * dy + dx:
                                                        3 * dy + dx + 1, :]
    z2 = jnp.dot(acc.astype(dtype), w2_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[1:2, :Cmid]
    t2 = jnp.maximum(z2, 0.0) * a_ref[1:2, :Cmid] + c_ref[1:2, :Cmid]
    t2 = t2.astype(dtype)

    z3 = jnp.dot(t2, w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :Cin]
    t3 = jnp.maximum(z3, 0.0) * a_ref[2:3, :Cin] + c_ref[2:3, :Cin]
    return (xf.astype(jnp.float32) + t3).astype(dtype).reshape(N, H, W, Cin)


def _mobile_bneck_kernel(x_ref, w1, d2, w2, w3, b, a, c, out_ref, *,
                         N, H, W, Cin, Cmid):
    out_ref[...] = _mobile_body(x_ref[...], w1, d2, w2, w3, b, a, c,
                                N, H, W, Cin, Cmid, x_ref.dtype)


def _mobile_bneck_pool_kernel(x_ref, w1, d2, w2, w3, b, a, c,
                              out_ref, pooled_ref, *, N, H, W, Cin, Cmid):
    """Mobile bottleneck + fused 2x2/s2 maxpool epilogue (two outputs)."""
    out = _mobile_body(x_ref[...], w1, d2, w2, w3, b, a, c,
                       N, H, W, Cin, Cmid, x_ref.dtype)
    out_ref[...] = out
    # reshape-split maxpool (strided slices would lower to gathers).
    p = jnp.max(out.reshape(N, H // 2, 2, W, Cin), axis=2)
    pooled_ref[...] = jnp.max(p.reshape(N, H // 2, W // 2, 2, Cin), axis=3)


def _mobile_uplevel_kernel(feat_ref, ulo_ref,
                           sw1, sd2, sw2, sw3, sb, sa, sc,
                           mw1, md2, mw2, mw3, mb, ma, mc,
                           out_ref, *, N, H, W, Cin, Cmid):
    """short-bneck(feat) + 2x upsample(u_lo) + add + merged-bneck, all in
    VMEM (the mobile twin of uplevel_kernel._uplevel_kernel)."""
    dtype = feat_ref.dtype
    d = _mobile_body(feat_ref[...], sw1, sd2, sw2, sw3, sb, sa, sc,
                     N, H, W, Cin, Cmid, dtype)
    ulo = ulo_ref[...]
    up = jnp.broadcast_to(ulo[:, :, None, :, None, :],
                          (N, H // 2, 2, W // 2, 2, Cin)
                          ).reshape(N, H, W, Cin)
    s = (d.astype(jnp.float32) + up.astype(jnp.float32)).astype(dtype)
    out_ref[...] = _mobile_body(s, mw1, md2, mw2, mw3, mb, ma, mc,
                                N, H, W, Cin, Cmid, dtype)


def _prep_operands(args, Cin, Cmid, dt):
    """(dw1, pw1, b1, dw2, pw2, b2, dw3, pw3, b3, a1, c1, a2, c2, a3, c3)
    -> kernel operand tuple (w1, d2, w2, w3, b_tab, a_tab, c_tab)."""
    (dw1, pw1, b1, dw2, pw2, b2, dw3, pw3, b3,
     a1, c1, a2, c2, a3, c3) = args
    w1 = dw1.astype(jnp.float32)[:, None] * pw1.astype(jnp.float32)
    w3 = dw3.astype(jnp.float32)[:, None] * pw3.astype(jnp.float32)
    d2 = dw2.astype(jnp.float32).reshape(9, Cmid)
    n = max(Cin, Cmid)

    def tab(v1, v2, v3):
        t = jnp.zeros((3, n), jnp.float32)
        return (t.at[0, :Cmid].set(v1.astype(jnp.float32))
                 .at[1, :Cmid].set(v2.astype(jnp.float32))
                 .at[2, :Cin].set(v3.astype(jnp.float32)))

    return (w1.astype(dt), d2, pw2.astype(dt), w3.astype(dt),
            tab(b1, b2, b3), tab(a1, a2, a3), tab(c1, c2, c3))


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_bottleneck_mobile(x, *args, interpret: bool = False, nimg: int = 0):
    """Identity-skip mobile bottleneck with folded inference-BN affines.

    args = (dw1 (Cin,), pw1 (Cin, Cm), b1, dw2 (3, 3, Cm), pw2 (Cm, Cm),
    b2, dw3 (Cm,), pw3 (Cm, Cin), b3, a1, c1, a2, c2, a3, c3) — the
    tuple mobile_bneck_params returns. Returns (B, H, W, Cin), dtype of x.
    """
    B, H, W, Cin = x.shape
    Cmid = args[1].shape[1]
    dt = x.dtype
    N = resolve_nimg(nimg, B, H, W)
    ops = _prep_operands(args, Cin, Cmid, dt)

    kernel = partial(_mobile_bneck_kernel, N=N, H=H, W=W, Cin=Cin, Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [full()] * 7,
        out_specs=pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(x, *ops)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_bottleneck_mobile_pool(x, *args, interpret: bool = False,
                                 nimg: int = 0):
    """Like fused_bottleneck_mobile but ALSO returns the 2x2/s2 maxpool of
    the output, computed in VMEM. Returns (out, pooled)."""
    B, H, W, Cin = x.shape
    Cmid = args[1].shape[1]
    dt = x.dtype
    N = resolve_nimg(nimg, B, H, W)
    ops = _prep_operands(args, Cin, Cmid, dt)

    kernel = partial(_mobile_bneck_pool_kernel, N=N, H=H, W=W, Cin=Cin,
                     Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [full()] * 7,
        out_specs=(
            pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, H // 2, W // 2, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cin), dt),
            jax.ShapeDtypeStruct((B, H // 2, W // 2, Cin), dt),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(x, *ops)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_uplevel_mobile(feat, u_lo, short_args, merged_args,
                         interpret: bool = False, nimg: int = 0):
    """feat (B, H, W, C); u_lo (B, H/2, W/2, C); short_args/merged_args =
    mobile_bneck_params tuples. One VMEM launch for the whole decoder
    level (mobile twin of uplevel_kernel.fused_uplevel)."""
    B, H, W, Cin = feat.shape
    Cmid = short_args[1].shape[1]
    dt = feat.dtype
    N = resolve_nimg(nimg, B, H, W, target_rows=2048)
    sp = _prep_operands(short_args, Cin, Cmid, dt)
    mp = _prep_operands(merged_args, Cin, Cmid, dt)

    kernel = partial(_mobile_uplevel_kernel, N=N, H=H, W=W, Cin=Cin,
                     Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, H // 2, W // 2, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full()] * 14,
        out_specs=pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(feat, u_lo, *sp, *mp)


def mobile_bneck_params(params, stats, name, bn_affine, eps):
    """Extract one mobile bottleneck's kernel arguments from the flax
    SeparableConv layout: params[name + '_conv_*'] = {'depthwise':
    {'kernel' (k,k,1,C)}, 'pointwise': {'kernel' (1,1,C,Cout),
    'bias'}} (models/hourglass.py SeparableConv)."""
    def sep(n):
        p = params[n]
        dw = p["depthwise"]["kernel"]  # flax grouped-conv layout (k, k, 1, C)
        pw = p["pointwise"]["kernel"][0, 0]
        b = p["pointwise"]["bias"]
        if dw.shape[0] == 1:          # 1x1 depthwise -> per-channel scale
            return dw[0, 0, 0], pw, b
        return dw[:, :, 0], pw, b     # (3, 3, C)

    def aff(n):
        return bn_affine(params[n]["scale"], params[n]["bias"],
                         stats[n]["mean"], stats[n]["var"], eps)

    dw1, pw1, b1 = sep(name + "_conv_1x1_1")
    dw2, pw2, b2 = sep(name + "_conv_3x3_2")
    dw3, pw3, b3 = sep(name + "_conv_1x1_3")
    a1, c1 = aff(name + "_conv_1x1_1_bn")
    a2, c2 = aff(name + "_conv_3x3_2_bn")
    a3, c3 = aff(name + "_conv_1x1_3_bn")
    return (dw1, pw1, b1, dw2, pw2, b2, dw3, pw3, b3,
            a1, c1, a2, c2, a3, c3)
