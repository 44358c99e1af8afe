"""Training-mode hourglass bottleneck with a hand-fused backward pass.

Why this exists: the train step is HBM-bandwidth-bound, not FLOPs-bound —
fwd+bwd at B=64 moves ~113 GB in 131 ms (cost-analysis bytes) with the
MXU at 27% (scripts/bench_bwd_variants.py). XLA's autodiff materializes
every BN/ReLU intermediate of the backward chain in HBM, and remat
policies make it worse (the recomputed chain is re-materialized, not
fused — measured in models/hourglass.py `remat` docs). This module is a
custom_vjp whose backward runs as a few fused passes that keep the
elementwise BN/ReLU recomputation in registers/VMEM.

MEASURED OUTCOME (v5e, S4/256, B=64 — see models/fused_train.py for the
full table): neither the plain-lax phase backward (136 ms vs flax's
131 ms) nor the Pallas phase kernels (158 ms; per-level wins only at
H=8/16) beat XLA autodiff inside the full program, so the DEFAULT train
path remains flax + XLA autodiff. Kept as the bit-verified backward
derivation + per-level kernel dial for future tuning.

Forward math (reference hourglass.py:184-206, identity skip, train mode —
flax BatchNorm semantics replicated exactly: f32 stats, fast variance
E[x^2]-E[x]^2 clamped at 0, normalize in f32, cast to compute dtype):

    y1 = x @ W1 + b1;  a1 = relu(y1);  z1 = gamma1*(a1-mu1)*s1 + beta1
    y2 = conv3x3(z1, W2) + b2;  a2 = relu(y2);  z2 = BN2(a2)
    y3 = z2 @ W3 + b3;  a3 = relu(y3);  z3 = BN3(a3)
    out = x + z3
    (s_i = rsqrt(var_i + eps))

Backward math per unit, given dz (cotangent of z), N = B*H*W:
    xhat = (a - mu) * s
    dbeta = sum(dz);  dgamma = sum(dz * xhat)
    da = gamma * s * (dz - dbeta/N - xhat * dgamma/N)
    dy = da * (y > 0)
    dW = in^T dy (conv-transposed for the 3x3);  db = sum(dy)
    din = dy W^T (conv with rotated kernel for the 3x3)
and for the bottleneck: dz3 = g (the output cotangent), dx = g + din1.

The dbeta/dgamma sums ARE the BN parameter grads, so each unit's backward
is two passes: (A) the per-channel reductions, (B) the elementwise chain +
conv grads. Phases run A3 -> B3 -> A2 -> B2 -> A1 -> B1 with only dz2/dz1
round-tripping HBM between units.

This module provides the plain-jnp phase implementation (the correctness
anchor, equality-tested against jax autodiff of the same forward in
tests/test_bottleneck_grad.py) behind `jax.custom_vjp`; the Pallas phase
kernels plug in behind the same interface.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# Forward pieces (plain lax; mirror flax exactly).
# ---------------------------------------------------------------------------

def _bn_stats(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """flax._compute_stats: at-least-f32, fast variance, clamped at zero."""
    a32 = a.astype(jnp.promote_types(a.dtype, jnp.float32))
    mu = jnp.mean(a32, axis=(0, 1, 2))
    mu2 = jnp.mean(a32 * a32, axis=(0, 1, 2))
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, var


def _bn_apply(a, mu, var, gamma, beta, out_dtype):
    s = lax.rsqrt(var + _BN_EPS)
    acc = jnp.promote_types(a.dtype, jnp.float32)
    y = (a.astype(acc) - mu) * (s * gamma) + beta
    return y.astype(out_dtype)


def _conv1x1(x, w, b):
    # Computed in x.dtype with the bias added in-dtype — exactly what
    # flax nn.Conv(dtype=compute_dtype) lowers to, so the fused path's
    # forward is numerically identical to the model's.
    return jnp.dot(x, w.astype(x.dtype)) + b.astype(x.dtype)


def _conv3x3(x, w, b):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def bottleneck_train_fwd(x, w1, b1, w2, b2, w3, b3,
                         g1, be1, g2, be2, g3, be3):
    """Returns (out, (mu1, var1, mu2, var2, mu3, var3), residuals).
    Residuals are the POST-relu activations a1/a2/a3 (plus x): the relu
    mask (a > 0) and xhat = (a - mu)*s derive from them directly, and the
    Pallas forward kernels produce exactly these tensors."""
    dt = x.dtype
    a1 = jnp.maximum(_conv1x1(x, w1, b1), 0)
    mu1, var1 = _bn_stats(a1)
    z1 = _bn_apply(a1, mu1, var1, g1, be1, dt)

    a2 = jnp.maximum(_conv3x3(z1, w2, b2), 0)
    mu2, var2 = _bn_stats(a2)
    z2 = _bn_apply(a2, mu2, var2, g2, be2, dt)

    a3 = jnp.maximum(_conv1x1(z2, w3, b3), 0)
    mu3, var3 = _bn_stats(a3)
    z3 = _bn_apply(a3, mu3, var3, g3, be3, dt)

    out = x + z3
    stats = (mu1, var1, mu2, var2, mu3, var3)
    return out, stats, (x, a1, a2, a3)


def _stats_from_sums(sums, n):
    """(2, C) f32 [sum, sumsq] -> (mu, var), flax fast-variance form."""
    mu = sums[0] / n
    var = jnp.maximum(0.0, sums[1] / n - mu * mu)
    return mu, var


def _fold_affine(mu, var, gamma, beta):
    """Train-BN as a per-channel affine: bn(a) = a*scale + shift."""
    s = lax.rsqrt(var + _BN_EPS)
    scale = s * gamma
    return scale, beta - mu * scale


def bottleneck_train_fwd_pallas(x, w1, b1, w2, b2, w3, b3,
                                g1, be1, g2, be2, g3, be3,
                                interpret: bool = False):
    """Same contract as bottleneck_train_fwd, but each conv->relu unit is
    one Pallas kernel (bottleneck_train_kernel.py) with the previous BN
    folded into its prologue and its batch-stat sums accumulated in its
    epilogue: one HBM round trip per activation instead of XLA's five."""
    from single_person_pose_estimation_tpu.experimental import (
        bottleneck_train_kernel as ker,
    )

    B, H, W, _ = x.shape
    n = B * H * W
    a1, sums1 = ker.conv1x1_relu_stats(x, w1, b1, interpret=interpret)
    mu1, var1 = _stats_from_sums(sums1, n)
    sc1, sh1 = _fold_affine(mu1, var1, g1, be1)
    a2, sums2 = ker.conv3x3_relu_stats(a1, w2, b2, sc1, sh1,
                                       interpret=interpret)
    mu2, var2 = _stats_from_sums(sums2, n)
    sc2, sh2 = _fold_affine(mu2, var2, g2, be2)
    a3, sums3 = ker.conv1x1_relu_stats(a2, w3, b3, scale=sc2, shift=sh2,
                                       interpret=interpret)
    mu3, var3 = _stats_from_sums(sums3, n)
    sc3, sh3 = _fold_affine(mu3, var3, g3, be3)
    # Final normalize + skip add: a single fused XLA elementwise op.
    out = x + (a3.astype(jnp.float32) * sc3 + sh3).astype(x.dtype)
    stats = (mu1, var1, mu2, var2, mu3, var3)
    return out, stats, (x, a1, a2, a3)


# ---------------------------------------------------------------------------
# Backward phases (plain-jnp reference).
# ---------------------------------------------------------------------------

def _unit_bwd(dz, a, mu, var, gamma):
    """Phases A+B for one conv->relu->BN unit given the saved POST-relu
    activation a: returns (dy, dgamma, dbeta). dz in any float dtype;
    math in at-least-f32. relu mask: a > 0 iff pre-relu y > 0."""
    n = dz.shape[0] * dz.shape[1] * dz.shape[2]
    acc = jnp.promote_types(dz.dtype, jnp.float32)
    s = lax.rsqrt(var + _BN_EPS)                       # (C,) f32+
    xhat = (a.astype(acc) - mu) * s
    dz32 = dz.astype(acc)
    dbeta = jnp.sum(dz32, axis=(0, 1, 2))              # phase A
    dgamma = jnp.sum(dz32 * xhat, axis=(0, 1, 2))      # phase A
    da = (gamma * s) * (dz32 - dbeta / n - xhat * (dgamma / n))
    # Cotangent continues in the residual's compute dtype (bf16 on TPU),
    # exactly like XLA autodiff — an f32 dy would double the bytes of
    # every downstream conv-grad read.
    dy = jnp.where(a > 0, da, 0.0).astype(a.dtype)     # phase B
    return dy, dgamma, dbeta


def _conv1x1_grads(x, dy, w, out_dtype):
    """dW = x^T dy over flattened rows; din = dy W^T. Operands stay in
    the compute dtype (MXU-native, f32 accumulation via
    preferred_element_type); only the small dW/db outputs are f32."""
    acc = jnp.promote_types(dy.dtype, jnp.float32)
    xf = x.reshape(-1, x.shape[-1])
    dyf = dy.reshape(-1, dy.shape[-1]).astype(x.dtype)
    dw = jnp.dot(xf.T, dyf, preferred_element_type=acc)
    db = jnp.sum(dyf.astype(acc), axis=0)
    din = jnp.dot(dyf, w.astype(x.dtype).T, preferred_element_type=acc)
    return dw, db, din.reshape(x.shape).astype(out_dtype)


def _conv3x3_grads(x, dy, w, out_dtype):
    """3x3 SAME stride-1 conv grads via XLA's NATIVE grad convolutions
    (jax.vjp of the conv itself). A first cut computed these as 9 shifted
    matmuls — the form a Pallas kernel would use — but under XLA each
    shifted slice materializes a full HBM copy: measured 230 GB accessed
    for the S4/256 B=64 step vs 113 GB for plain autodiff (2x the bytes,
    238 ms vs 131 ms). The native filter-grad / input-grad convs keep the
    shift-and-accumulate inside the conv emitter where it belongs."""
    acc = jnp.promote_types(dy.dtype, jnp.float32)

    def conv(x_, w_):
        return lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dy_c = dy.astype(x.dtype)
    _, vjp = jax.vjp(conv, x, w.astype(x.dtype))
    din, dw = vjp(dy_c)
    db = jnp.sum(dy.reshape(-1, dy.shape[-1]).astype(acc), axis=0)
    return dw.astype(acc), db, din.astype(out_dtype)


def _bn_recompute(a, mu, var, gamma, beta, dt):
    return _bn_apply(a, mu, var, gamma, beta, dt)


def bottleneck_train_bwd(residuals, g):
    """Backward for bottleneck_train: returns grads matching the fwd's
    13 array args (x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3)."""
    (x, a1, a2, a3, mu1, var1, mu2, var2, mu3, var3,
     w1, w2, w3, g1, be1, g2, be2, g3, be3) = residuals
    dt = x.dtype

    # Unit 3 (1x1, C/2 -> C): dz3 = g.
    dy3, dg3, dbe3 = _unit_bwd(g, a3, mu3, var3, g3)
    z2 = _bn_recompute(a2, mu2, var2, g2, be2, dt)
    dw3, db3, dz2 = _conv1x1_grads(z2, dy3, w3, dt)

    # Unit 2 (3x3, C/2 -> C/2).
    dy2, dg2, dbe2 = _unit_bwd(dz2, a2, mu2, var2, g2)
    z1 = _bn_recompute(a1, mu1, var1, g1, be1, dt)
    dw2, db2, dz1 = _conv3x3_grads(z1, dy2, w2, dt)

    # Unit 1 (1x1, C -> C/2).
    dy1, dg1, dbe1 = _unit_bwd(dz1, a1, mu1, var1, g1)
    dw1, db1, din = _conv1x1_grads(x, dy1, w1, dt)

    accd = jnp.promote_types(g.dtype, jnp.float32)
    dx = (g.astype(accd) + din.astype(accd)).astype(dt)
    return (dx,
            dw1.reshape(w1.shape), db1, dw2, db2,
            dw3.reshape(w3.shape), db3,
            dg1, dbe1, dg2, dbe2, dg3, dbe3)


# ---------------------------------------------------------------------------
# custom_vjp wiring.
# ---------------------------------------------------------------------------

def _bwd_consts(r0, r1, mu, var, gamma, n):
    """Per-channel K1/K2/K3 for the masked BN+relu backward affine
    da = K1*dz + K2*a + K3, plus (dgamma, dbeta). r0/r1 are the
    reductions sum(dz), sum(dz*a)."""
    s = lax.rsqrt(var + _BN_EPS)
    dbeta = r0
    dgamma = s * (r1 - mu * r0)
    k1 = gamma * s
    k2 = -gamma * s * s * dgamma / n
    k3 = -k1 * dbeta / n + gamma * s * s * mu * dgamma / n
    return jnp.stack([k1, k2, k3]), dgamma, dbeta


def bottleneck_train_bwd_pallas(residuals, g, interpret: bool = False):
    """Pallas phase-kernel backward (bottleneck_train_kernel.py): one
    reduction kernel + three compute kernels, each folding the next
    unit's reductions into its epilogue. Same contract as
    bottleneck_train_bwd."""
    from single_person_pose_estimation_tpu.experimental import (
        bottleneck_train_kernel as ker,
    )

    (x, a1, a2, a3, mu1, var1, mu2, var2, mu3, var3,
     w1, w2, w3, g1, be1, g2, be2, g3, be3) = residuals
    B, H, W, _ = x.shape
    n = B * H * W

    sums3 = ker.bn_bwd_reduce(g, a3, interpret=interpret)
    k3c, dg3, dbe3 = _bwd_consts(sums3[0], sums3[1], mu3, var3, g3, n)
    aff2 = jnp.stack(_fold_affine(mu2, var2, g2, be2))
    dz2, dw3, db3, sums2 = ker.unit1x1_bwd(
        g, a3, a2, w3, k3c, aff2, affine_cin=True, reduce_next=True,
        interpret=interpret)

    k2c, dg2, dbe2 = _bwd_consts(sums2[0], sums2[1], mu2, var2, g2, n)
    aff1 = jnp.stack(_fold_affine(mu1, var1, g1, be1))
    dz1, dw2, db2, sums1 = ker.unit3x3_bwd(
        dz2, a2, a1, w2, k2c, aff1, interpret=interpret)

    k1c, dg1, dbe1 = _bwd_consts(sums1[0], sums1[1], mu1, var1, g1, n)
    dx, dw1, db1 = ker.unit1_bwd(dz1, a1, x, g, w1, k1c,
                                 interpret=interpret)

    return (dx,
            dw1.astype(w1.dtype), db1[0].astype(jnp.float32),
            dw2.astype(w2.dtype), db2[0].astype(jnp.float32),
            dw3.astype(w3.dtype), db3[0].astype(jnp.float32),
            dg1, dbe1, dg2, dbe2, dg3, dbe3)


@lru_cache(maxsize=None)
def make_bottleneck_train(backend: str = "jnp", interpret: bool = False):
    """Build the custom_vjp'd train-mode bottleneck.

    backend selects the forward/backward implementations independently
    (all share the same residuals (x, a1, a2, a3) and numerics):
      "jnp"        - plain-lax fwd + phase bwd (the correctness anchor)
      "pallas"     - Pallas fwd kernels + Pallas phase-kernel bwd
      "pallas_fwd" - Pallas fwd, plain bwd
      "pallas_bwd" - plain fwd, Pallas bwd
    interpret=True runs any Pallas kernels in interpreter mode (CPU
    tests).

    Returns f(x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3) ->
    (out, (mu1, var1, mu2, var2, mu3, var3)). Differentiable in every
    array input; the stats outputs carry no gradient (they feed the
    running-stat update only)."""
    if backend not in ("jnp", "pallas", "pallas_fwd", "pallas_bwd"):
        raise ValueError(f"unknown bottleneck backend: {backend!r}")
    if backend in ("pallas", "pallas_fwd"):
        def fwd_impl(*args):
            return bottleneck_train_fwd_pallas(*args, interpret=interpret)
    else:
        fwd_impl = bottleneck_train_fwd
    if backend in ("pallas", "pallas_bwd"):
        def bwd_impl(res, g):
            return bottleneck_train_bwd_pallas(res, g, interpret=interpret)
    else:
        bwd_impl = bottleneck_train_bwd

    @jax.custom_vjp
    def f(x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3):
        out, stats, _ = fwd_impl(x, w1, b1, w2, b2, w3, b3,
                                 g1, be1, g2, be2, g3, be3)
        return out, stats

    def _fwd(x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3):
        out, stats, (x_, a1, a2, a3) = fwd_impl(
            x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3)
        res = (x_, a1, a2, a3, *stats,
               w1, w2, w3, g1, be1, g2, be2, g3, be3)
        return (out, stats), res

    def _bwd(res, cotangents):
        g, _ = cotangents  # stats cotangents are zero
        return bwd_impl(res, g)

    f.defvjp(_fwd, _bwd)
    return f


# The plain-lax instance (correctness anchor; also the CPU path).
bottleneck_train = make_bottleneck_train("jnp")
