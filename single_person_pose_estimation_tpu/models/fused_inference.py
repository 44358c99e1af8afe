"""Fused inference forward: the stacked hourglass with every hourglass
bottleneck executed by the fully-fused Pallas kernel.

Consumes the SAME flax variables as models.hourglass.StackedHourglass and
produces the same per-stack heatmaps (equality-tested in
tests/test_fused_inference.py); the front module, pooling, upsampling and
heads stay on XLA (the front bottlenecks have conv skips and live at
128x128 where the whole-map-in-VMEM strategy doesn't fit), while the 15
identity-skip bottlenecks per stack — the bulk of the FLOPs and all of the
intermediate HBM traffic — run via ops.pallas.bottleneck_kernel.

Inference only (running BN statistics; no gradient path).

Measured (v5e, S4/256, B=128, bf16), round-2 progression:
  * round 1: per-image grids — bottlenecks 1814, + level fusion 2268,
    vs plain XLA 2342-2373 img/s (XLA won);
  * batch-blocked grids (pick_nimg: weight DMA amortized, small levels'
    matmuls MXU-filling): 2321;
  * + pool fusion at the <=32px levels (pool_fuse_max_h=32; the 64px
    level keeps the XLA pool — fusing it costs Mosaic's double-buffer
    headroom, 3015 vs 3128): 2474;
  * + fused head/inter-stack glue (ops.pallas.head_kernel — the 1x1-conv
    chain was ~16 MB/image/stack of HBM round trips, cut to ~7): 3128
    img/s, +33% over XLA;
  * + fuse_bottom (ops.pallas.bottom_kernel — the innermost subtree,
    depth d = 6..12 bottlenecks + pools + upsample+adds, in ONE launch):
    a measured NON-win. Interleaved A/B medians: depth 0 = 3079, depth 1
    = 3059 (-0.7%); depth 2 = 2981, depth 3 = 2898 — one serialized
    megakernel loses to Mosaic pipelining separate small kernels. Kept
    as a documented experiment; OFF in bench.py's default path (which is
    fuse_levels + pool_fuse_max_h=32 + fuse_heads).
Numerics: exact vs model.apply at f32 (<=7e-6) for all fusion levels
(tests/test_fused_inference.py); at bf16 divergence is rounding-level
(~1e-2) and compounds through the inter-stack feedback as with any
reordered bf16 accumulation (these kernels accumulate in f32 — more
precisely than the bf16 XLA path). On-HARDWARE parity (compiled Mosaic,
not interpret mode) is asserted by scripts/validate_fused_tpu.py at
S4/256 @ 256^2, B in {1, 128}, f32 and bf16, for every flag combination
plus the eval/serving wiring; results table in PERF.md.

VMEM constraint: the kernels' blocking is tuned for 2-byte compute
dtypes. At f32 every buffer doubles and the 64px level exceeds the
default 16 MB scoped-VMEM limit even at one image per grid step
(measured on v5e: 23.77 MB). Callers with compute_dtype=float32 must
either stay on model.apply (eval/serving "auto" does this) or raise
--xla_tpu_scoped_vmem_limit_kib via jit compiler_options as
scripts/validate_fused_tpu.py does.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List

import jax
import jax.numpy as jnp
from jax import lax

from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
    bn_affine,
    fused_bottleneck,
    fused_bottleneck_convskip,
    fused_bottleneck_pool,
    pick_nimg,
)
from single_person_pose_estimation_tpu.ops.pallas.bottom_kernel import (
    fused_subtree,
    pack_subtree_params,
)
from single_person_pose_estimation_tpu.ops.pallas.head_kernel import (
    fused_head,
)
from single_person_pose_estimation_tpu.ops.pallas.uplevel_kernel import (
    fused_uplevel,
)

_BN_EPS = 1e-3


def _conv(params, x, name, stride=1):
    k = params[name]["kernel"].astype(x.dtype)
    b = params[name]["bias"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _bn(params, stats, x, name):
    a, c = bn_affine(params[name]["scale"], params[name]["bias"],
                     stats[name]["mean"], stats[name]["var"], _BN_EPS)
    return x * a.astype(x.dtype) + c.astype(x.dtype)


def _sepconv(params, x, name):
    """SeparableConv2D on XLA: depthwise (grouped conv, no bias) then
    pointwise 1x1 + bias (models/hourglass.py SeparableConv)."""
    dw = params[name]["depthwise"]["kernel"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, dw, (1, 1), "SAME", feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pw = params[name]["pointwise"]["kernel"].astype(x.dtype)
    b = params[name]["pointwise"]["bias"].astype(x.dtype)
    y = lax.conv_general_dilated(
        y, pw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _bottleneck_xla(params, stats, x, name, channels, mobile=False):
    """Plain XLA bottleneck (used in the front, where skips are convs).
    mobile=True uses SeparableConv2D for every bottleneck conv including
    the skip (reference hourglass.py:209-231)."""
    conv = _sepconv if mobile else _conv
    if x.shape[-1] == channels:
        skip = x
    else:
        skip = jnp.maximum(conv(params, x, name + "_skip"), 0)
    y = jnp.maximum(conv(params, x, name + "_conv_1x1_1"), 0)
    y = _bn(params, stats, y, name + "_conv_1x1_1_bn")
    y = jnp.maximum(conv(params, y, name + "_conv_3x3_2"), 0)
    y = _bn(params, stats, y, name + "_conv_3x3_2_bn")
    y = jnp.maximum(conv(params, y, name + "_conv_1x1_3"), 0)
    y = _bn(params, stats, y, name + "_conv_1x1_3_bn")
    return skip + y


def _bottleneck_front_fused(params, stats, x, name, channels, interpret,
                            rows=4096):
    """Front bottleneck via the fused kernels: identity-skip reuses
    fused_bottleneck; channel-changing skips use the conv-skip variant."""
    p = _bneck_params(params, stats, name)
    B, H, W, _ = x.shape
    n = pick_nimg(B, H, W, rows)
    if x.shape[-1] == channels:
        return fused_bottleneck(
            x, p["w1"], p["b1"], p["w2"], p["b2"], p["w3"], p["b3"],
            p["a1"], p["c1"], p["a2"], p["c2"], p["a3"], p["c3"],
            interpret=interpret, nimg=n)
    ps = params[name + "_skip"]
    return fused_bottleneck_convskip(
        x, ps["kernel"][0, 0], ps["bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["w3"], p["b3"],
        p["a1"], p["c1"], p["a2"], p["c2"], p["a3"], p["c3"],
        interpret=interpret, nimg=n)


def _bneck_params(params, stats, name):
    """Extract {w*, b*, a*, c*} for one bottleneck with folded BN affines."""
    def aff(n):
        return bn_affine(params[n]["scale"], params[n]["bias"],
                         stats[n]["mean"], stats[n]["var"], _BN_EPS)

    a1, c1 = aff(name + "_conv_1x1_1_bn")
    a2, c2 = aff(name + "_conv_3x3_2_bn")
    a3, c3 = aff(name + "_conv_1x1_3_bn")
    p1 = params[name + "_conv_1x1_1"]
    p2 = params[name + "_conv_3x3_2"]
    p3 = params[name + "_conv_1x1_3"]
    return {"w1": p1["kernel"][0, 0], "b1": p1["bias"],
            "w2": p2["kernel"], "b2": p2["bias"],
            "w3": p3["kernel"][0, 0], "b3": p3["bias"],
            "a1": a1, "c1": c1, "a2": a2, "c2": c2, "a3": a3, "c3": c3}


def _bottleneck_fused(params, stats, x, name, interpret, rows=4096):
    p = _bneck_params(params, stats, name)
    B, H, W, _ = x.shape
    return fused_bottleneck(
        x, p["w1"], p["b1"], p["w2"], p["b2"], p["w3"], p["b3"],
        p["a1"], p["c1"], p["a2"], p["c2"], p["a3"], p["c3"],
        interpret=interpret, nimg=pick_nimg(B, H, W, rows))


def _bottleneck_mobile_fused(params, stats, x, name, interpret, rows=4096):
    from single_person_pose_estimation_tpu.ops.pallas.mobile_kernel import (
        fused_bottleneck_mobile,
        mobile_bneck_params,
    )

    B, H, W, _ = x.shape
    args = mobile_bneck_params(params, stats, name, bn_affine, _BN_EPS)
    return fused_bottleneck_mobile(
        x, *args, interpret=interpret, nimg=pick_nimg(B, H, W, rows))


def _bottleneck_pool_fused(params, stats, x, name, interpret, rows=4096):
    """Bottleneck with the 2x2/s2 maxpool fused as a VMEM epilogue;
    returns (out, pooled)."""
    p = _bneck_params(params, stats, name)
    B, H, W, _ = x.shape
    return fused_bottleneck_pool(
        x, p["w1"], p["b1"], p["w2"], p["b2"], p["w3"], p["b3"],
        p["a1"], p["c1"], p["a2"], p["c2"], p["a3"], p["c3"],
        interpret=interpret, nimg=pick_nimg(B, H, W, rows))


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _upsample2x(x):
    B, H, W, C = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return y.reshape(B, H * 2, W * 2, C)


@partial(jax.jit, static_argnames=("num_stacks", "compute_dtype", "interpret",
                                   "fuse_levels", "bneck_rows",
                                   "uplevel_rows", "pool_fuse_max_h",
                                   "fuse_heads", "fuse_bottom",
                                   "fuse_front", "front_s2d",
                                   "fuse_max_h", "mobile"))
def fused_apply(variables: Any, images: jnp.ndarray, num_stacks: int = 4,
                compute_dtype=jnp.bfloat16,
                interpret: bool = False,
                fuse_levels: bool = False,
                bneck_rows: int = 4096,
                uplevel_rows: int = 4096,
                pool_fuse_max_h: int = 0,
                fuse_heads: bool = False,
                fuse_bottom: int = 0,
                fuse_front: bool = False,
                front_s2d: bool = False,
                fuse_max_h: int = 64,
                mobile: bool = False) -> List[jnp.ndarray]:
    """Drop-in for `model.apply(variables, images, train=False)` on the
    non-mobile hourglass, with Pallas-fused hourglass bottlenecks.

    bneck_rows / uplevel_rows: batch-blocking targets (spatial rows per
    grid step) for the two kernels — see ops.pallas.bottleneck_kernel
    .pick_nimg. pool_fuse_max_h: fuse the downsample maxpool into the
    producing bottleneck kernel for levels with H <= this (0 = never).
    fuse_max_h: levels with H above this stay on XLA — the bottleneck and
    uplevel kernels block per whole image, and beyond 64 rows a single
    128x128x256 bf16 map (8 MB) plus its padded copy and mid buffers
    exceeds the Mosaic VMEM budget (hit at 512^2 inputs, where the f1
    level doubles to 128 rows; the row-blocked head kernel is unaffected).
    The boundary is also MEASURED, not just a VMEM constraint: a
    row-blocked kernel (ops.pallas.bottleneck_kernel.fused_bottleneck_rows)
    loses to XLA by 11-16% at the 128px levels at every feasible strip
    height (scripts/bench_rows_bneck_ab.py, PERF.md) — at large maps
    XLA's native conv is near bandwidth and the 9-shifted-matmul trick
    pays a VMEM copy per tap.
    mobile: the model's bottleneck convs are SeparableConv2D (reference
    hourglass.py:209-231); hourglass bottleneck/pool/uplevel fusion runs
    the mobile Pallas kernels (ops.pallas.mobile_kernel — 1x1 depthwise
    scales folded into the pointwise matmuls, 3x3 depthwise as 9 VPU
    multiply-adds in VMEM); fuse_heads works unchanged (heads are plain
    convs in both variants); fuse_bottom/fuse_front are standard-conv
    kernels and are ignored in mobile mode."""
    params = variables["params"]
    stats = variables["batch_stats"]
    x = images.astype(compute_dtype)
    if mobile:
        # The subtree/front fusions are standard-conv kernels; bottleneck,
        # pool and uplevel fusion have mobile twins (ops.pallas.mobile_kernel).
        fuse_bottom = 0
        fuse_front = False

    # Front module (XLA): 7x7/s2 conv -> relu -> BN, three bottlenecks.
    # front_s2d computes the opening conv as the folded 4x4/s1 conv over
    # the space-to-depth input (ops/space_to_depth.py) — exactly equal.
    if front_s2d:
        from single_person_pose_estimation_tpu.ops.space_to_depth import (
            front_conv_s2d,
        )
        p0 = params["front_conv_1x1_1"]
        y = jnp.maximum(front_conv_s2d(x, p0["kernel"], p0["bias"]), 0)
    else:
        y = jnp.maximum(_conv(params, x, "front_conv_1x1_1", stride=2), 0)
    y = _bn(params, stats, y, "front_conv_1x1_1_bn")
    fb3 = params["front_bottleneck_3_conv_1x1_3"]
    c = (fb3["pointwise"]["kernel"] if mobile else fb3["kernel"]).shape[-1]
    # front_bottleneck_1 runs at the half-res level (128px for 256px
    # inputs), where a whole-map-per-image block exceeds the Mosaic VMEM
    # budget — it stays on XLA even with fuse_front.
    y = _bottleneck_xla(params, stats, y, "front_bottleneck_1", c // 2,
                        mobile=mobile)
    y = _maxpool(y)
    if fuse_front:
        y = _bottleneck_front_fused(params, stats, y, "front_bottleneck_2",
                                    c // 2, interpret)
        y = _bottleneck_front_fused(params, stats, y, "front_bottleneck_3",
                                    c, interpret)
    else:
        y = _bottleneck_xla(params, stats, y, "front_bottleneck_2", c // 2,
                            mobile=mobile)
        y = _bottleneck_xla(params, stats, y, "front_bottleneck_3", c,
                            mobile=mobile)

    def bneck(x, name):
        if x.shape[1] > fuse_max_h:
            return _bottleneck_xla(params, stats, x, name, c, mobile=mobile)
        if mobile:
            return _bottleneck_mobile_fused(params, stats, x, name,
                                            interpret=interpret,
                                            rows=bneck_rows)
        return _bottleneck_fused(params, stats, x, name,
                                 interpret=interpret, rows=bneck_rows)

    def down(x, name):
        """Downsample bottleneck: returns (level_output, pooled)."""
        if x.shape[1] > fuse_max_h:
            out = _bottleneck_xla(params, stats, x, name, c, mobile=mobile)
            return out, _maxpool(out)
        if x.shape[1] <= pool_fuse_max_h:
            if mobile:
                from single_person_pose_estimation_tpu.ops.pallas.mobile_kernel import (  # noqa: E501
                    fused_bottleneck_mobile_pool,
                    mobile_bneck_params,
                )
                B, H, W, _ = x.shape
                return fused_bottleneck_mobile_pool(
                    x, *mobile_bneck_params(params, stats, name, bn_affine,
                                            _BN_EPS),
                    interpret=interpret,
                    nimg=pick_nimg(B, H, W, bneck_rows))
            return _bottleneck_pool_fused(params, stats, x, name,
                                          interpret=interpret,
                                          rows=bneck_rows)
        out = bneck(x=x, name=name)
        return out, _maxpool(out)

    outputs = []
    for i in range(num_stacks):
        name = f"hg{i}"
        # NOTE (round 1): pool fusion at ALL levels was slower (1785 vs
        # 2268 img/s) — the 64x64 level's raised VMEM budget cost Mosaic
        # its double-buffering headroom. pool_fuse_max_h lets the small
        # levels fuse their pools while 64x64 keeps the XLA pool.
        # Encoder: the outer levels run level-by-level; the innermost
        # `depth` levels (fuse_bottom = 0..3) run as ONE subtree launch —
        # that region is launch-latency-bound (bottom_kernel.py).
        depth = int(fuse_bottom)
        outer_levels = ["f1", "f2", "f4", "f8"][:4 - depth]
        skips = []
        pd = y
        for lname in outer_levels:
            f, pd = down(pd, f"{name}_downsample_{lname}")
            skips.append((f, lname))
        if depth:
            u = fused_subtree(
                pd, *pack_subtree_params(params, stats, name, bn_affine,
                                         depth, _BN_EPS),
                depth=depth, interpret=interpret)
        else:
            b = bneck(x=pd, name=name + "_downsample_f8_1")
            b = bneck(x=b, name=name + "_downsample_f8_2")
            b = bneck(x=b, name=name + "_downsample_f8_3")
            u = b
        for feat, lvl in reversed(skips):
            if fuse_levels and feat.shape[1] <= fuse_max_h and mobile:
                from single_person_pose_estimation_tpu.ops.pallas.mobile_kernel import (  # noqa: E501
                    fused_uplevel_mobile,
                    mobile_bneck_params,
                )
                u = fused_uplevel_mobile(
                    feat, u,
                    mobile_bneck_params(params, stats,
                                        f"{name}_upsample_{lvl}_short",
                                        bn_affine, _BN_EPS),
                    mobile_bneck_params(params, stats,
                                        f"{name}_upsample_{lvl}_merged",
                                        bn_affine, _BN_EPS),
                    interpret=interpret,
                    nimg=pick_nimg(feat.shape[0], feat.shape[1],
                                   feat.shape[2], uplevel_rows))
            elif fuse_levels and feat.shape[1] <= fuse_max_h:
                u = fused_uplevel(
                    feat, u,
                    _bneck_params(params, stats,
                                  f"{name}_upsample_{lvl}_short"),
                    _bneck_params(params, stats,
                                  f"{name}_upsample_{lvl}_merged"),
                    interpret=interpret,
                    nimg=pick_nimg(feat.shape[0], feat.shape[1],
                                   feat.shape[2], uplevel_rows))
            else:
                d = bneck(x=feat, name=f"{name}_upsample_{lvl}_short")
                u = d + _upsample2x(u)
                u = bneck(x=u, name=f"{name}_upsample_{lvl}_merged")

        last = i == num_stacks - 1
        if fuse_heads:
            ha, hc = bn_affine(params[name + "_conv_1x1_1_bn"]["scale"],
                               params[name + "_conv_1x1_1_bn"]["bias"],
                               stats[name + "_conv_1x1_1_bn"]["mean"],
                               stats[name + "_conv_1x1_1_bn"]["var"],
                               _BN_EPS)
            glue = {}
            if not last:
                glue = {
                    "w2": params[name + "_conv_1x1_2"]["kernel"][0, 0],
                    "b2": params[name + "_conv_1x1_2"]["bias"],
                    "w3": params[name + "_conv_1x1_3"]["kernel"][0, 0],
                    "b3": params[name + "_conv_1x1_3"]["bias"],
                }
            head_predict, y_next = fused_head(
                u, y,
                params[name + "_conv_1x1_1"]["kernel"][0, 0],
                params[name + "_conv_1x1_1"]["bias"], ha, hc,
                params[name + "_conv_1x1_predict"]["kernel"][0, 0],
                params[name + "_conv_1x1_predict"]["bias"],
                last=last, interpret=interpret, **glue)
            outputs.append(head_predict)
            if not last:
                y = y_next
        else:
            head = jnp.maximum(_conv(params, u, name + "_conv_1x1_1"), 0)
            head = _bn(params, stats, head, name + "_conv_1x1_1_bn")
            zp = _conv(params, head, name + "_conv_1x1_predict")
            head_predict = jax.nn.sigmoid(zp.astype(jnp.float32))
            outputs.append(head_predict)
            if not last:
                h2 = _conv(params, head, name + "_conv_1x1_2")
                hm = _conv(params, head_predict.astype(compute_dtype),
                           name + "_conv_1x1_3")
                y = h2 + hm + y
    return outputs


# ---------------------------------------------------------------------------
# Backend-selection policy (single source: serving.PoseServer and
# evaluation.predict both route through these — keep the tuning here).
# ---------------------------------------------------------------------------

# Above this input size the auto backend falls back to the flax model:
# fused measured -12% at 512^2 (every flag combo loses there — XLA<->Pallas
# boundary costs at the 128px levels; scripts/sweep_fused_generalization.py
# + scripts/ablate_fused_512.py). Explicit use_fused=True overrides.
FUSED_AUTO_MAX_INPUT = 256


def auto_use_fused(model) -> bool:
    """The "auto" backend policy: fused kernels on TPU with a 2-byte
    compute dtype. At f32 the fused kernels' VMEM blocking exceeds the
    scoped limit at the 64px level (measured on v5e,
    scripts/validate_fused_tpu.py); everywhere else flax+XLA wins."""
    import jax

    return (jax.default_backend() == "tpu"
            and jnp.dtype(model.compute_dtype).itemsize == 2)


def forward_last_stack(model, variables, images, *, use_fused: bool,
                       auto: bool, interpret: bool = False):
    """Shared inference forward: last stack's heatmaps via the fused path,
    or flax when disabled / when auto mode hits the >FUSED_AUTO_MAX_INPUT
    fallback. `auto` says whether use_fused came from auto_use_fused (only
    then does the size fallback apply — an explicit True is honored)."""
    if use_fused and not (auto and images.shape[1] > FUSED_AUTO_MAX_INPUT):
        return fused_apply(variables, images, num_stacks=model.num_stacks,
                           compute_dtype=model.compute_dtype,
                           fuse_levels=True, pool_fuse_max_h=32,
                           fuse_heads=True,
                           mobile=bool(getattr(model, "mobile", False)),
                           interpret=interpret)[-1]
    return model.apply(variables, images, train=False)[-1]
