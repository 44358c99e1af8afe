"""Pallas TPU kernels: train-mode hourglass bottleneck FORWARD.

Train-mode BN needs the full batch's statistics before it can normalize,
so the inference kernel's single fused pass (bottleneck_kernel.py) is
impossible: the dependency chain is conv1 -> stats1 -> norm1+conv2 ->
stats2 -> norm2+conv3 -> stats3 -> norm3+add. What CAN fuse is each
conv -> relu unit with (a) the PREVIOUS unit's normalize folded into its
prologue as a per-channel affine (z = a*scale + shift with
scale = gamma*rsqrt(var+eps), shift = beta - mu*scale) and (b) its own
batch-statistics reduction folded into its epilogue, accumulated in f32
across the sequential TPU grid. Per unit the activation makes exactly one
HBM round trip (write a, read a in the next kernel) versus XLA's five
(write y, read for stats, read for normalize, write z, read z) — the
measured reason the flax train step is HBM-bound at ~859 GB/s with the
MXU at 27% (scripts/bench_bwd_variants.py).

Reference semantics: hourglass.py:184-206 bottleneck, flax BatchNorm
statistics (f32, fast variance E[x^2]-E[x]^2, computed over the
compute-dtype-rounded activations). Consumed by
ops/pallas/bottleneck_grad.bottleneck_train_p (custom_vjp) via
models/fused_train.py; equality-tested in tests/test_bottleneck_grad.py
and tests/test_fused_train.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
    resolve_nimg,
)

# The 64x64-level blocks put several multi-MB operands plus f32 matmul
# accumulators on the Mosaic stack — past the 16 MB default scoped
# budget (measured: unit1x1_bwd needs 20.5 MB at H=64, B-block=1).
# v5e has 128 MB VMEM/core; 40 MB leaves room for double-buffered DMA.
_VMEM_LIMIT = 40 * 1024 * 1024


def _conv1x1_relu_stats_kernel(x_ref, sc_ref, sh_ref, w_ref, b_ref,
                               a_ref, sums_ref, *, N, H, W, Cin, Cout,
                               affine):
    b = pl.program_id(0)
    x = x_ref[...].reshape(N * H * W, Cin)
    if affine:
        # Previous unit's train-BN folded to a per-input-channel affine.
        x = (x.astype(jnp.float32) * sc_ref[...]
             + sh_ref[...]).astype(x.dtype)
    z = jnp.dot(x, w_ref[...],
                preferred_element_type=jnp.float32) + b_ref[...]
    a = jnp.maximum(z, 0.0).astype(x_ref.dtype)
    a_ref[...] = a.reshape(N, H, W, Cout)
    # Batch statistics over the compute-dtype-rounded activation (flax
    # casts the conv output before computing stats).
    a32 = a.astype(jnp.float32)

    @pl.when(b == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[0:1, :] += jnp.sum(a32, axis=0, keepdims=True)
    sums_ref[1:2, :] += jnp.sum(a32 * a32, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def conv1x1_relu_stats(x, w, b, scale=None, shift=None,
                       interpret: bool = False, nimg: int = 0):
    """a = relu((x*scale + shift) @ w + b); also returns (2, Cout) f32
    [sum(a), sum(a^2)] over all batch/spatial positions. scale/shift are
    per-INPUT-channel (None = identity, for the bottleneck's first unit
    whose input is the raw skip tensor)."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    dt = x.dtype
    N = resolve_nimg(nimg, B, H, W)
    affine = scale is not None
    if not affine:
        scale = jnp.ones((Cin,), jnp.float32)
        shift = jnp.zeros((Cin,), jnp.float32)

    kernel = partial(_conv1x1_relu_stats_kernel, N=N, H=H, W=W,
                     Cin=Cin, Cout=Cout, affine=affine)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    a, sums = pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
        ],
        out_specs=(
            pl.BlockSpec((N, H, W, Cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cout), dt),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32),
      w.astype(dt), b.reshape(1, -1).astype(jnp.float32))
    return a, sums


def _conv3x3_relu_stats_kernel(x_ref, sc_ref, sh_ref, w_ref, b_ref,
                               a_ref, sums_ref, *, N, H, W, Cin, Cout):
    bidx = pl.program_id(0)
    x = x_ref[...].reshape(N * H * W, Cin)
    z_in = (x.astype(jnp.float32) * sc_ref[...]
            + sh_ref[...]).astype(x_ref.dtype).reshape(N, H, W, Cin)
    # 3x3 SAME conv as 9 shifted matmuls over a zero-padded VMEM copy.
    zp = jnp.pad(z_in, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = zp[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cin)
            acc = acc + jnp.dot(sl, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    a = jnp.maximum(acc + b_ref[...], 0.0).astype(x_ref.dtype)
    a_ref[...] = a.reshape(N, H, W, Cout)
    a32 = a.astype(jnp.float32)

    @pl.when(bidx == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[0:1, :] += jnp.sum(a32, axis=0, keepdims=True)
    sums_ref[1:2, :] += jnp.sum(a32 * a32, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def conv3x3_relu_stats(x, w, b, scale, shift, interpret: bool = False,
                       nimg: int = 0):
    """a = relu(conv3x3(x*scale + shift, w) + b) (SAME, stride 1) plus the
    (2, Cout) f32 [sum, sum-of-squares] epilogue."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    dt = x.dtype
    N = resolve_nimg(nimg, B, H, W)
    kernel = partial(_conv3x3_relu_stats_kernel, N=N, H=H, W=W,
                     Cin=Cin, Cout=Cout)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    a, sums = pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
        ],
        out_specs=(
            pl.BlockSpec((N, H, W, Cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cout), dt),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32),
      w.astype(dt), b.reshape(1, -1).astype(jnp.float32))
    return a, sums


# ---------------------------------------------------------------------------
# Backward kernels.
#
# Per conv->relu->BN unit the backward is
#     da = gamma*s*(dz - dbeta/n - xhat*dgamma/n),  dy = (a > 0) ? da : 0
# which collapses to a per-channel AFFINE of the two tensors already in
# VMEM:  da = K1*dz + K2*a + K3  with
#     K1 = gamma*s,  K2 = -gamma*s^2*dgamma/n,
#     K3 = -K1*dbeta/n + gamma*s^2*mu*dgamma/n,
# and dbeta/dgamma derive from the reductions r0 = sum(dz),
# r1 = sum(dz*a) (dgamma = s*(r1 - mu*r0)). So each unit needs one
# reduction pass and one compute pass — and since unit k's compute kernel
# produces dz_{k-1} while a_{k-1} is already loaded (for the conv-input
# recompute), unit k-1's reductions ride unit k's epilogue for free. The
# whole bottleneck backward is FOUR kernels:
#     A3:  r0/r1 of (g, a3)
#     B3:  dy3 -> dW3/db3, dz2;  + r0/r1 of (dz2, a2)
#     B2:  dy2 -> dW2/db2 (9 shifted matmuls), dz1;  + r0/r1 of (dz1, a1)
#     B1:  dy1 -> dW1/db1, dx = g + dy1 @ W1^T
# dW/db/r accumulate in f32 VMEM across the sequential batch grid.
# ---------------------------------------------------------------------------


def _reduce_kernel(dz_ref, a_ref, sums_ref, *, R, C):
    b = pl.program_id(0)
    dz = dz_ref[...].reshape(R, C).astype(jnp.float32)
    a = a_ref[...].reshape(R, C).astype(jnp.float32)

    @pl.when(b == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[0:1, :] += jnp.sum(dz, axis=0, keepdims=True)
    sums_ref[1:2, :] += jnp.sum(dz * a, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def bn_bwd_reduce(dz, a, interpret: bool = False, nimg: int = 0):
    """(2, C) f32 [sum(dz), sum(dz*a)] over batch+spatial."""
    B, H, W, C = dz.shape
    N = resolve_nimg(nimg, B, H, W)
    kernel = partial(_reduce_kernel, R=N * H * W, C=C)
    blk = lambda c: pl.BlockSpec((N, H, W, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[blk(C), blk(C)],
        out_specs=pl.BlockSpec((2, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dz, a)


def _dy(dz32, a32, k_ref):
    """Masked BN+relu backward affine: (a>0) ? K1*dz + K2*a + K3 : 0."""
    da = k_ref[0:1, :] * dz32 + k_ref[1:2, :] * a32 + k_ref[2:3, :]
    return jnp.where(a32 > 0, da, 0.0)


def _unit1x1_bwd_kernel(dz_ref, a_ref, cin_ref, w_ref, k_ref, aff_ref,
                        dznext_ref, dw_ref, db_ref, sums_ref, *,
                        R, C, Cm, affine_cin, reduce_next):
    """Backward of a 1x1 conv->relu->BN unit. dz (R, C) is this unit's BN
    cotangent; a (R, C) its saved activation; cin (R, Cm) the conv input's
    SAVED form (raw x, or the previous unit's activation to re-normalize
    via aff). Emits dz for the previous unit (R, Cm), accumulates dW
    (Cm, C), db (1, C), and optionally the previous unit's reductions."""
    b = pl.program_id(0)
    dt = a_ref.dtype
    dz32 = dz_ref[...].reshape(R, C).astype(jnp.float32)
    a32 = a_ref[...].reshape(R, C).astype(jnp.float32)
    dy = _dy(dz32, a32, k_ref).astype(dt)                 # (R, C)
    cin = cin_ref[...].reshape(R, Cm)
    if affine_cin:
        cin = (cin.astype(jnp.float32) * aff_ref[0:1, :]
               + aff_ref[1:2, :]).astype(dt)
    dw = lax.dot_general(cin, dy, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)  # (Cm, C)
    din = lax.dot_general(dy, w_ref[...], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (R, Cm)
    din_dt = din.astype(dt)
    dznext_ref[...] = din_dt.reshape(dznext_ref.shape)

    @pl.when(b == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        sums_ref[...] = jnp.zeros_like(sums_ref)

    dw_ref[...] += dw
    db_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    if reduce_next:
        din32 = din_dt.astype(jnp.float32)
        cin32 = cin_ref[...].reshape(R, Cm).astype(jnp.float32)
        sums_ref[0:1, :] += jnp.sum(din32, axis=0, keepdims=True)
        sums_ref[1:2, :] += jnp.sum(din32 * cin32, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("interpret", "nimg", "affine_cin",
                                   "reduce_next"))
def unit1x1_bwd(dz, a, cin, w, k, aff=None, affine_cin: bool = True,
                reduce_next: bool = True, interpret: bool = False,
                nimg: int = 0):
    """Backward for a 1x1 unit: returns (dz_prev, dw, db, sums_prev).
    dz/a: (B, H, W, C); cin: (B, H, W, Cm) saved conv input (re-normalized
    with aff=(2, Cm) when affine_cin); w: (Cm, C); k: (3, C) the
    K1/K2/K3 affine rows. sums_prev rows are [sum(dz_prev),
    sum(dz_prev * cin)] (only meaningful when reduce_next)."""
    B, H, W, C = dz.shape
    Cm = w.shape[0]
    dt = a.dtype
    N = resolve_nimg(nimg, B, H, W)
    if aff is None:
        aff = jnp.zeros((2, Cm), jnp.float32)
    kernel = partial(_unit1x1_bwd_kernel, R=N * H * W, C=C, Cm=Cm,
                     affine_cin=affine_cin, reduce_next=reduce_next)
    blk = lambda c: pl.BlockSpec((N, H, W, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[blk(C), blk(C), blk(Cm), full(), full(), full()],
        out_specs=(blk(Cm), acc((Cm, C)), acc((1, C)), acc((2, Cm))),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cm), dt),
            jax.ShapeDtypeStruct((Cm, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((2, Cm), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dz, a, cin, w.astype(dt), k.astype(jnp.float32),
      aff.astype(jnp.float32))


def _unit3x3_bwd_kernel(dz_ref, a_ref, cin_ref, w_ref, k_ref, aff_ref,
                        dznext_ref, dw_ref, db_ref, sums_ref, *,
                        N, H, W, C):
    """Backward of the 3x3 conv->relu->BN unit (C == Cin == Cout)."""
    b = pl.program_id(0)
    dt = a_ref.dtype
    R = N * H * W
    dz32 = dz_ref[...].reshape(R, C).astype(jnp.float32)
    a32 = a_ref[...].reshape(R, C).astype(jnp.float32)
    dy = _dy(dz32, a32, k_ref).astype(dt).reshape(N, H, W, C)
    z = (cin_ref[...].reshape(R, C).astype(jnp.float32) * aff_ref[0:1, :]
         + aff_ref[1:2, :]).astype(dt).reshape(N, H, W, C)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(R, C)
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))
    din = jnp.zeros((R, C), jnp.float32)
    dw = [[None] * 3 for _ in range(3)]
    for p in range(3):
        for q in range(3):
            zsl = zp[:, p:p + H, q:q + W, :].reshape(R, C)
            dw[p][q] = lax.dot_general(
                zsl, dyf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dsl = dyp[:, p:p + H, q:q + W, :].reshape(R, C)
            # din += shift_{p,q}(dy) @ W[2-p, 2-q]^T (I/O-contracted).
            din = din + lax.dot_general(
                dsl, w_ref[2 - p, 2 - q], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    din_dt = din.astype(dt)
    dznext_ref[...] = din_dt.reshape(N, H, W, C)

    @pl.when(b == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        sums_ref[...] = jnp.zeros_like(sums_ref)

    for p in range(3):
        for q in range(3):
            dw_ref[p, q] += dw[p][q]
    db_ref[...] += jnp.sum(dyf.astype(jnp.float32), axis=0, keepdims=True)
    din32 = din_dt.astype(jnp.float32)
    cin32 = cin_ref[...].reshape(R, C).astype(jnp.float32)
    sums_ref[0:1, :] += jnp.sum(din32, axis=0, keepdims=True)
    sums_ref[1:2, :] += jnp.sum(din32 * cin32, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def unit3x3_bwd(dz, a, cin, w, k, aff, interpret: bool = False,
                nimg: int = 0):
    """Backward for the 3x3 unit: returns (dz_prev, dw, db, sums_prev).
    dz/a/cin: (B, H, W, C); w: (3, 3, C, C); k: (3, C); aff: (2, C) the
    previous unit's BN affine."""
    B, H, W, C = dz.shape
    dt = a.dtype
    N = resolve_nimg(nimg, B, H, W)
    kernel = partial(_unit3x3_bwd_kernel, N=N, H=H, W=W, C=C)
    blk = lambda: pl.BlockSpec((N, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[blk(), blk(), blk(), full(), full(), full()],
        out_specs=(blk(), acc((3, 3, C, C)), acc((1, C)), acc((2, C))),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), dt),
            jax.ShapeDtypeStruct((3, 3, C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dz, a, cin, w.astype(dt), k.astype(jnp.float32),
      aff.astype(jnp.float32))


def _unit1_bwd_kernel(dz_ref, a_ref, x_ref, g_ref, w_ref, k_ref,
                      dx_ref, dw_ref, db_ref, *, R, C, Cm):
    """Backward of the FIRST unit (1x1, Cin=C -> Cm) + the skip add:
    dx = g + dy1 @ W1^T. cin is the raw x (no affine)."""
    b = pl.program_id(0)
    dt = a_ref.dtype
    dz32 = dz_ref[...].reshape(R, Cm).astype(jnp.float32)
    a32 = a_ref[...].reshape(R, Cm).astype(jnp.float32)
    dy = _dy(dz32, a32, k_ref).astype(dt)                 # (R, Cm)
    x = x_ref[...].reshape(R, C)
    dw = lax.dot_general(x, dy, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)  # (C, Cm)
    din = lax.dot_general(dy, w_ref[...], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (R, C)
    g32 = g_ref[...].reshape(R, C).astype(jnp.float32)
    dx_ref[...] = (g32 + din.astype(dt).astype(jnp.float32)).astype(
        dt).reshape(dx_ref.shape)

    @pl.when(b == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += dw
    db_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def unit1_bwd(dz, a, x, g, w, k, interpret: bool = False, nimg: int = 0):
    """Backward for unit 1 + skip: returns (dx, dw, db)."""
    B, H, W, Cm = dz.shape
    C = x.shape[-1]
    dt = a.dtype
    N = resolve_nimg(nimg, B, H, W)
    kernel = partial(_unit1_bwd_kernel, R=N * H * W, C=C, Cm=Cm)
    blk = lambda c: pl.BlockSpec((N, H, W, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[blk(Cm), blk(Cm), blk(C), blk(C), full(), full()],
        out_specs=(blk(C), acc((C, Cm)), acc((1, Cm))),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), dt),
            jax.ShapeDtypeStruct((C, Cm), jnp.float32),
            jax.ShapeDtypeStruct((1, Cm), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dz, a, x, g, w.astype(dt), k.astype(jnp.float32))
