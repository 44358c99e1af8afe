"""Training-mode hourglass bottleneck with a hand-fused backward pass.

Why this exists: the train step is HBM-bandwidth-bound, not FLOPs-bound —
fwd+bwd at B=64 moves ~113 GB in 131 ms (~859 GB/s, v5e speed-of-light)
with the MXU at 27% (scripts/bench_bwd_variants.py). XLA's autodiff
materializes every BN/ReLU intermediate of the backward chain in HBM, and
remat policies make it worse (the recomputed chain is re-materialized, not
fused — measured in models/hourglass.py `remat` docs). The fix is a
custom_vjp whose backward runs as a few fused passes that keep the
elementwise BN/ReLU recomputation in registers/VMEM.

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
    """Returns (out, (mu1, var1, mu2, var2, mu3, var3), residuals)."""
    dt = x.dtype
    y1 = _conv1x1(x, w1, b1)
    a1 = jnp.maximum(y1, 0)
    mu1, var1 = _bn_stats(a1)
    z1 = _bn_apply(a1, mu1, var1, g1, be1, dt)

    y2 = _conv3x3(z1, w2, b2)
    a2 = jnp.maximum(y2, 0)
    mu2, var2 = _bn_stats(a2)
    z2 = _bn_apply(a2, mu2, var2, g2, be2, dt)

    y3 = _conv1x1(z2, w3, b3)
    a3 = jnp.maximum(y3, 0)
    mu3, var3 = _bn_stats(a3)
    z3 = _bn_apply(a3, mu3, var3, g3, be3, dt)

    out = x + z3
    stats = (mu1, var1, mu2, var2, mu3, var3)
    return out, stats, (x, y1, y2, y3)


# ---------------------------------------------------------------------------
# Backward phases (plain-jnp reference).
# ---------------------------------------------------------------------------

def _unit_bwd(dz, y, mu, var, gamma):
    """Phases A+B for one conv->relu->BN unit: returns
    (dy, dgamma, dbeta). dz in any float dtype; math in at-least-f32."""
    n = dz.shape[0] * dz.shape[1] * dz.shape[2]
    acc = jnp.promote_types(dz.dtype, jnp.float32)
    s = lax.rsqrt(var + _BN_EPS)                       # (C,) f32+
    a = jnp.maximum(y.astype(acc), 0)
    xhat = (a - mu) * s
    dz32 = dz.astype(acc)
    dbeta = jnp.sum(dz32, axis=(0, 1, 2))              # phase A
    dgamma = jnp.sum(dz32 * xhat, axis=(0, 1, 2))      # phase A
    da = (gamma * s) * (dz32 - dbeta / n - xhat * (dgamma / n))
    dy = jnp.where(y > 0, da, 0.0)                     # phase B
    return dy, dgamma, dbeta


def _conv1x1_grads(x, dy, w, out_dtype):
    """dW = x^T dy over flattened rows; din = dy W^T."""
    acc = jnp.promote_types(dy.dtype, jnp.float32)
    xf = x.reshape(-1, x.shape[-1]).astype(acc)
    dyf = dy.reshape(-1, dy.shape[-1])
    dw = jnp.dot(xf.T, dyf, preferred_element_type=acc)
    db = jnp.sum(dyf, axis=0)
    din = jnp.dot(dyf, w.astype(acc).T, preferred_element_type=acc)
    return dw, db, din.reshape(x.shape).astype(out_dtype)


def _conv3x3_grads(x, dy, w, out_dtype):
    """3x3 SAME stride-1 conv grads as shifted matmuls (the exact form the
    Pallas kernel uses): dW[p,q] = sum_n shift_{p,q}(x)^T dy;
    din = conv(dy, rot180(W) with I/O swapped)."""
    B, H, W_, Cin = x.shape
    Cout = dy.shape[-1]
    acc = jnp.promote_types(dy.dtype, jnp.float32)
    xp = jnp.pad(x.astype(acc), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(-1, Cout).astype(acc)
    dw = jnp.zeros((3, 3, Cin, Cout), acc)
    for p in range(3):
        for q in range(3):
            sl = xp[:, p:p + H, q:q + W_, :].reshape(-1, Cin)
            dw = dw.at[p, q].set(
                jnp.dot(sl.T, dyf, preferred_element_type=acc))
    db = jnp.sum(dyf, axis=0)
    # din: SAME conv of dy with the spatially-rotated, I/O-swapped kernel.
    wt = jnp.flip(w.astype(acc), (0, 1)).transpose(0, 1, 3, 2)
    dyp = jnp.pad(dy.astype(acc), ((0, 0), (1, 1), (1, 1), (0, 0)))
    din = jnp.zeros((B * H * W_, Cin), acc)
    for p in range(3):
        for q in range(3):
            sl = dyp[:, p:p + H, q:q + W_, :].reshape(-1, Cout)
            din = din + jnp.dot(sl, wt[p, q], preferred_element_type=acc)
    return dw, db, din.reshape(x.shape).astype(out_dtype)


def _bn_recompute(y, mu, var, gamma, beta, dt):
    return _bn_apply(jnp.maximum(y, 0), mu, var, gamma, beta, dt)


def bottleneck_train_bwd(residuals, g):
    """Backward for bottleneck_train: returns grads matching the fwd's
    13 array args (x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3)."""
    (x, y1, y2, y3, mu1, var1, mu2, var2, mu3, var3,
     w1, w2, w3, g1, be1, g2, be2, g3, be3) = residuals
    dt = x.dtype

    # Unit 3 (1x1, C/2 -> C): dz3 = g.
    dy3, dg3, dbe3 = _unit_bwd(g, y3, mu3, var3, g3)
    z2 = _bn_recompute(y2, mu2, var2, g2, be2, dt)
    dw3, db3, dz2 = _conv1x1_grads(z2, dy3, w3, dt)

    # Unit 2 (3x3, C/2 -> C/2).
    dy2, dg2, dbe2 = _unit_bwd(dz2, y2, mu2, var2, g2)
    z1 = _bn_recompute(y1, mu1, var1, g1, be1, dt)
    dw2, db2, dz1 = _conv3x3_grads(z1, dy2, w2, dt)

    # Unit 1 (1x1, C -> C/2).
    dy1, dg1, dbe1 = _unit_bwd(dz1, y1, mu1, var1, g1)
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

@jax.custom_vjp
def bottleneck_train(x, w1, b1, w2, b2, w3, b3,
                     g1, be1, g2, be2, g3, be3):
    """Identity-skip bottleneck, train-mode BN. Returns (out, stats) where
    stats = (mu1, var1, mu2, var2, mu3, var3) — the batch statistics the
    caller folds into the running averages. Differentiable in every array
    input; the stats outputs carry no gradient (they feed the running-stat
    update only)."""
    out, stats, _ = bottleneck_train_fwd(x, w1, b1, w2, b2, w3, b3,
                                         g1, be1, g2, be2, g3, be3)
    return out, stats


def _fwd(x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3):
    out, stats, (x_, y1, y2, y3) = bottleneck_train_fwd(
        x, w1, b1, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3)
    res = (x_, y1, y2, y3, *stats, w1, w2, w3, g1, be1, g2, be2, g3, be3)
    return (out, stats), res


def _bwd(res, cotangents):
    g, _ = cotangents  # stats cotangents are zero (non-differentiable use)
    return bottleneck_train_bwd(res, g)


bottleneck_train.defvjp(_fwd, _bwd)
