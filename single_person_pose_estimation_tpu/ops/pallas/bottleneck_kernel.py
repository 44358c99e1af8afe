"""Pallas TPU kernel: fully-fused hourglass bottleneck (inference).

The bottleneck (reference hourglass.py:184-206) is
    t1 = bn1(relu(x @ W1 + b1))          # 1x1, C -> C/2
    t2 = bn2(relu(conv3x3(t1, W2) + b2)) # 3x3, C/2 -> C/2
    t3 = bn3(relu(t2 @ W3 + b3))         # 1x1, C/2 -> C
    out = x + t3                         # identity skip (C == C)
XLA executes the three convs as separate HBM->HBM ops: per 64x64x256
bottleneck at batch 128 that's ~1.7 GB of intermediate traffic. A whole
64x64x256 bf16 feature map is only 2 MB — this kernel keeps the entire
bottleneck in VMEM: one grid step per image loads x once, runs all three
matmuls (the 3x3 as 9 shifted (HW, C/2) @ (C/2, C/2) MXU matmuls over a
zero-padded copy), applies the folded inference-BN affines (a*v + c with
a = gamma/sqrt(var+eps), c = beta - mean*a) and the residual add, and
writes out once.

Inference-only (BN uses running statistics; no custom VJP — the training
path keeps the flax/XLA implementation). Used by
models/fused_inference.py, which is equality-tested against model.apply.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bottleneck_kernel(x_ref, w1_ref, w2_ref, w3_ref, b_ref,
                       a1_ref, c1_ref, a2_ref, c2_ref, a3_ref, c3_ref,
                       out_ref, *, N, H, W, Cin, Cmid):
    x = x_ref[...]                                   # (N, H, W, Cin)
    xf = x.reshape(N * H * W, Cin)

    # 1x1 conv -> relu -> BN affine.
    z1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a1_ref[...] + c1_ref[...]
    t1 = t1.astype(x.dtype).reshape(N, H, W, Cmid)

    # 3x3 conv as 9 shifted matmuls over a per-image zero-padded VMEM copy.
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cmid)
            acc = acc + jnp.dot(sl, w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b_ref[1:2, :Cmid], 0.0) * a2_ref[...] + c2_ref[...]
    t2 = t2.astype(x.dtype)

    # 1x1 conv -> relu -> BN affine -> residual.
    z3 = jnp.dot(t2, w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :Cin]
    t3 = jnp.maximum(z3, 0.0) * a3_ref[...] + c3_ref[...]
    out = xf.astype(jnp.float32) + t3
    out_ref[...] = out.astype(x.dtype).reshape(N, H, W, Cin)


def pick_nimg(B: int, H: int, W: int, target_rows: int = 4096) -> int:
    """Images per grid step: the largest divisor of B whose block stays at
    ~target_rows spatial rows (64x64 -> 1, 32x32 -> 4, 16x16 -> 16, ...).

    Batch-blocking amortizes the weight DMA over several images and turns
    the small levels' skinny (HW, Cmid) matmuls into MXU-filling ones
    (8x8: M=64 -> M=4096) — the levels where the per-image grid lost to
    XLA (VERDICT.md Weak #2 / Next #3).

    A second cap bounds PADDED rows (N*(H+2)*(W+2) <= 8000): the 3x3's
    per-image zero-pad inflates small levels' VMEM footprint (at 4x4 the
    padded copy is 2.25x the block), and at B=256 the unpadded-rows cap
    alone let the 4x4 level pick N=256 — an 18.5 MB Mosaic stack, 2.5 MB
    over budget. 8000 keeps every B<=128 choice unchanged."""
    cap = max(1, min(target_rows // (H * W),
                     8000 // ((H + 2) * (W + 2))))
    n = 1
    for d in range(1, cap + 1):
        if B % d == 0:
            n = d
    return n


def resolve_nimg(nimg: int, B: int, H: int, W: int,
                 target_rows: int = 4096) -> int:
    """nimg=0 -> pick_nimg; an explicit nimg must divide B — the kernels
    launch B // nimg grid blocks, so a non-divisor would silently drop the
    tail images."""
    if nimg:
        if B % nimg:
            raise ValueError(
                f"nimg={nimg} must divide the batch size {B} "
                "(the kernel grid covers B // nimg image blocks)")
        return nimg
    return pick_nimg(B, H, W, target_rows)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3,
                     a1, c1, a2, c2, a3, c3, interpret: bool = False,
                     nimg: int = 0):
    """x (B, H, W, C); identity-skip bottleneck with folded BN affines.

    w1 (C, Cm), w2 (3, 3, Cm, Cm), w3 (Cm, C); b* biases; a*/c* the
    inference-BN scale/shift per channel. Returns (B, H, W, C), dtype of x.
    nimg: images per grid step (0 = auto via pick_nimg).
    """
    B, H, W, Cin = x.shape
    Cmid = w1.shape[1]
    dt = x.dtype
    N = resolve_nimg(nimg, B, H, W)
    # Biases padded into one (3, max(C, Cm)) table to limit operand count.
    bmax = max(Cin, Cmid)
    b_tab = jnp.zeros((3, bmax), jnp.float32)
    b_tab = b_tab.at[0, :Cmid].set(b1.astype(jnp.float32))
    b_tab = b_tab.at[1, :Cmid].set(b2.astype(jnp.float32))
    b_tab = b_tab.at[2, :Cin].set(b3.astype(jnp.float32))

    kernel = partial(_bottleneck_kernel, N=N, H=H, W=W, Cin=Cin, Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        interpret=interpret,
    )(x,
      w1.astype(dt), w2.astype(dt), w3.astype(dt), b_tab,
      a1.reshape(1, -1).astype(jnp.float32),
      c1.reshape(1, -1).astype(jnp.float32),
      a2.reshape(1, -1).astype(jnp.float32),
      c2.reshape(1, -1).astype(jnp.float32),
      a3.reshape(1, -1).astype(jnp.float32),
      c3.reshape(1, -1).astype(jnp.float32))


def bn_affine(scale, bias, mean, var, eps: float = 1e-3):
    """Fold inference BatchNorm into (a, c): bn(v) = a*v + c."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def _bottleneck_rows_kernel(x_ref, top_ref, bot_ref,
                            w1_ref, w2_ref, w3_ref, b_ref,
                            a1_ref, c1_ref, a2_ref, c2_ref, a3_ref, c3_ref,
                            out_ref, *, HB, W, Cin, Cmid):
    """Row-blocked bottleneck: the block is HB rows of ONE image, plus the
    two halo rows delivered as separate (pipelined) inputs. conv1 runs on
    all HB+2 rows (2-row recompute overhead); the 3x3 consumes the halo;
    conv3 + the identity skip produce the HB center rows."""
    x = x_ref[0]                                     # (HB, W, Cin)
    xh = jnp.concatenate([top_ref[0], x, bot_ref[0]], axis=0)
    xf = xh.reshape((HB + 2) * W, Cin)

    z1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a1_ref[...] + c1_ref[...]
    t1 = t1.astype(x.dtype).reshape(HB + 2, W, Cmid)

    # At the image border the reference 3x3 sees ZERO t1 rows, but a zero
    # x-halo row yields t1 = relu(b1)*a1+c1 != 0 — zero those rows here.
    h = pl.program_id(1)
    top_w = (h > 0).astype(t1.dtype)
    bot_w = (h < pl.num_programs(1) - 1).astype(t1.dtype)
    t1 = jnp.concatenate(
        [t1[0:1] * top_w, t1[1:HB + 1], t1[HB + 1:HB + 2] * bot_w], axis=0)

    # 3x3 over the W-padded copy; rows need no pad — the halo provides them.
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((HB * W, Cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[dy:dy + HB, dx:dx + W, :].reshape(HB * W, Cmid)
            acc = acc + jnp.dot(sl, w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b_ref[1:2, :Cmid], 0.0) * a2_ref[...] + c2_ref[...]
    t2 = t2.astype(x.dtype)

    z3 = jnp.dot(t2, w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :Cin]
    t3 = jnp.maximum(z3, 0.0) * a3_ref[...] + c3_ref[...]
    out = x.reshape(HB * W, Cin).astype(jnp.float32) + t3
    out_ref[0] = out.astype(x.dtype).reshape(HB, W, Cin)


@partial(jax.jit, static_argnames=("interpret", "hb"))
def fused_bottleneck_rows(x, w1, b1, w2, b2, w3, b3,
                          a1, c1, a2, c2, a3, c3, interpret: bool = False,
                          hb: int = 32):
    """Identity-skip bottleneck for levels whose whole map does NOT fit a
    VMEM block (H > 64: the 128px front/f1 levels, 256px at 512^2 inputs).

    Blocks each image into hb-row strips. The 3x3's one-row halos are
    sliced out of x in XLA beforehand (one (B, H/hb, W, C) plane per
    side, with zeros at the image border) and fed as their own pipelined
    BlockSpec inputs, so the kernel has no conditionals and Mosaic keeps
    its automatic double-buffering — the extra HBM read is 2/hb of x
    instead of the 2x of reading neighbor blocks whole."""
    B, H, W, Cin = x.shape
    Cmid = w1.shape[1]
    dt = x.dtype
    HB = min(hb, H)
    assert H % HB == 0, (H, HB)
    nh = H // HB
    zrow = jnp.zeros((B, 1, W, Cin), dt)
    # top halo for strip h is x row h*HB-1 (zeros for h=0)
    top = jnp.concatenate([zrow, x[:, HB - 1::HB][:, :nh - 1]], axis=1)
    bot = jnp.concatenate([x[:, HB::HB][:, :nh - 1], zrow], axis=1)

    bmax = max(Cin, Cmid)
    b_tab = jnp.zeros((3, bmax), jnp.float32)
    b_tab = b_tab.at[0, :Cmid].set(b1.astype(jnp.float32))
    b_tab = b_tab.at[1, :Cmid].set(b2.astype(jnp.float32))
    b_tab = b_tab.at[2, :Cin].set(b3.astype(jnp.float32))

    kernel = partial(_bottleneck_rows_kernel, HB=HB, W=W, Cin=Cin, Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, nh),
        in_specs=[
            pl.BlockSpec((1, HB, W, Cin), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Cin), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Cin), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((1, HB, W, Cin), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        # hb=64 strips at W=128 sit ~6MB over Mosaic's default 16MB scoped
        # budget (f32 z1/acc with Cmid padded to 128 lanes); v5e covers it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x, top, bot,
      w1.astype(dt), w2.astype(dt), w3.astype(dt), b_tab,
      a1.reshape(1, -1).astype(jnp.float32),
      c1.reshape(1, -1).astype(jnp.float32),
      a2.reshape(1, -1).astype(jnp.float32),
      c2.reshape(1, -1).astype(jnp.float32),
      a3.reshape(1, -1).astype(jnp.float32),
      c3.reshape(1, -1).astype(jnp.float32))
    return out


def _bottleneck_pool_kernel(x_ref, w1_ref, w2_ref, w3_ref, b_ref,
                            a1_ref, c1_ref, a2_ref, c2_ref, a3_ref, c3_ref,
                            out_ref, pooled_ref, *, N, H, W, Cin, Cmid):
    """Bottleneck + fused 2x2/s2 maxpool epilogue (two outputs)."""
    x = x_ref[...]                                   # (N, H, W, Cin)
    xf = x.reshape(N * H * W, Cin)
    z1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a1_ref[...] + c1_ref[...]
    t1 = t1.astype(x.dtype).reshape(N, H, W, Cmid)
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cmid)
            acc = acc + jnp.dot(sl, w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b_ref[1:2, :Cmid], 0.0) * a2_ref[...] + c2_ref[...]
    t2 = t2.astype(x.dtype)
    z3 = jnp.dot(t2, w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :Cin]
    t3 = jnp.maximum(z3, 0.0) * a3_ref[...] + c3_ref[...]
    # Residual add in the input dtype (identical at f32; saves a 4MB f32
    # buffer at bf16 — this variant was 410KB over the 16MB VMEM budget).
    out = (xf + t3.astype(x.dtype)).reshape(N, H, W, Cin)
    out_ref[...] = out
    # 2x2/s2 maxpool in VMEM via reshape-splits (strided slices would lower
    # to unsupported gathers); minor dim C is untouched by both reshapes.
    p = jnp.max(out.reshape(N, H // 2, 2, W, Cin), axis=2)  # (N, H/2, W, C)
    pooled_ref[...] = jnp.max(p.reshape(N, H // 2, W // 2, 2, Cin), axis=3)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_bottleneck_pool(x, w1, b1, w2, b2, w3, b3,
                          a1, c1, a2, c2, a3, c3, interpret: bool = False,
                          nimg: int = 0):
    """Like fused_bottleneck but ALSO returns the 2x2/s2 maxpool of the
    output, computed in VMEM. Returns (out, pooled).

    Measured (v5e, S4/256 fused path, B=128): a NET REGRESSION — 1785 vs
    2268 img/s with XLA pools. The 64x64x256 level needs vmem_limit_bytes
    raised past Mosaic's 16MB default, and that extra budget removes the
    headroom Mosaic uses to double-buffer block DMAs, serializing the
    pipeline. Kept as a documented experiment; fused_apply uses XLA pools."""
    B, H, W, Cin = x.shape
    Cmid = w1.shape[1]
    dt = x.dtype
    bmax = max(Cin, Cmid)
    b_tab = jnp.zeros((3, bmax), jnp.float32)
    b_tab = b_tab.at[0, :Cmid].set(b1.astype(jnp.float32))
    b_tab = b_tab.at[1, :Cmid].set(b2.astype(jnp.float32))
    b_tab = b_tab.at[2, :Cin].set(b3.astype(jnp.float32))

    N = resolve_nimg(nimg, B, H, W)
    kernel = partial(_bottleneck_pool_kernel, N=N, H=H, W=W, Cin=Cin,
                     Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
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
        # The 64x64x256 level sits ~0.5MB over Mosaic's default 16MB scoped
        # budget (pool-epilogue temporaries); v5e VMEM comfortably covers it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(x,
      w1.astype(dt), w2.astype(dt), w3.astype(dt), b_tab,
      a1.reshape(1, -1).astype(jnp.float32),
      c1.reshape(1, -1).astype(jnp.float32),
      a2.reshape(1, -1).astype(jnp.float32),
      c2.reshape(1, -1).astype(jnp.float32),
      a3.reshape(1, -1).astype(jnp.float32),
      c3.reshape(1, -1).astype(jnp.float32))


def _bottleneck_convskip_kernel(x_ref, ws_ref, w1_ref, w2_ref, w3_ref,
                                b_ref, a1_ref, c1_ref, a2_ref, c2_ref,
                                a3_ref, c3_ref, out_ref, *,
                                N, H, W, Cin, Cmid, Cout):
    """Bottleneck whose skip is a 1x1 conv + relu (no BN) — the front
    module's channel-changing bottlenecks (reference hourglass.py:184-193,
    Cin != Cout branch)."""
    x = x_ref[...]                                   # (N, H, W, Cin)
    xf = x.reshape(N * H * W, Cin)
    skip = jnp.maximum(
        jnp.dot(xf, ws_ref[...],
                preferred_element_type=jnp.float32) + b_ref[3:4, :Cout],
        0.0).astype(x.dtype)
    z1 = jnp.dot(xf, w1_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a1_ref[...] + c1_ref[...]
    t1 = t1.astype(x.dtype).reshape(N, H, W, Cmid)
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cmid)
            acc = acc + jnp.dot(sl, w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b_ref[1:2, :Cmid], 0.0) * a2_ref[...] + c2_ref[...]
    t2 = t2.astype(x.dtype)
    z3 = jnp.dot(t2, w3_ref[...],
                 preferred_element_type=jnp.float32) + b_ref[2:3, :Cout]
    t3 = (jnp.maximum(z3, 0.0) * a3_ref[...] + c3_ref[...]).astype(x.dtype)
    out_ref[...] = (skip + t3).reshape(N, H, W, Cout)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_bottleneck_convskip(x, ws, bs, w1, b1, w2, b2, w3, b3,
                              a1, c1, a2, c2, a3, c3,
                              interpret: bool = False, nimg: int = 0):
    """Conv-skip bottleneck: out = relu(x @ ws + bs) + bn3(relu(...)).
    x (B, H, W, Cin); ws (Cin, Cout); w3 (Cm, Cout). Returns
    (B, H, W, Cout)."""
    B, H, W, Cin = x.shape
    Cmid = w1.shape[1]
    Cout = ws.shape[1]
    dt = x.dtype
    N = resolve_nimg(nimg, B, H, W)
    bmax = max(Cin, Cmid, Cout)
    b_tab = jnp.zeros((4, bmax), jnp.float32)
    b_tab = b_tab.at[0, :Cmid].set(b1.astype(jnp.float32))
    b_tab = b_tab.at[1, :Cmid].set(b2.astype(jnp.float32))
    b_tab = b_tab.at[2, :Cout].set(b3.astype(jnp.float32))
    b_tab = b_tab.at[3, :Cout].set(bs.astype(jnp.float32))

    kernel = partial(_bottleneck_convskip_kernel, N=N, H=H, W=W,
                     Cin=Cin, Cmid=Cmid, Cout=Cout)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((N, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(x, ws.astype(dt), w1.astype(dt), w2.astype(dt), w3.astype(dt),
      b_tab,
      a1.reshape(1, -1).astype(jnp.float32),
      c1.reshape(1, -1).astype(jnp.float32),
      a2.reshape(1, -1).astype(jnp.float32),
      c2.reshape(1, -1).astype(jnp.float32),
      a3.reshape(1, -1).astype(jnp.float32),
      c3.reshape(1, -1).astype(jnp.float32))
