"""Space-to-depth folding of the front 7x7/s2 convolution.

The reference front module opens with a 7x7 stride-2 conv on the 3-channel
input (reference model/hourglass.py:54-58). On TPU a 3-deep reduction
badly underfills the MXU's 128-deep systolic reduction and the C=3 input
layout pads to the native tile anyway. The MLPerf-ResNet remedy applies
here unchanged: transform the input 256x256x3 -> 128x128x12 (2x2 blocks
into channels) and fold the 7x7/s2 kernel into an EXACTLY equivalent
4x4/s1 kernel over the 12-channel input (VERDICT r2 Weak #2 / Next #4).

Derivation (per spatial dim): SAME padding for k=7, s=2 on even input
pads (2, 3), so out[y] = sum_i W[i] X[2y + i - 2]. Writing i - 2 = 2k + d
with d in {0, 1} maps each of the 7 taps onto (k in -1..2, d), i.e. a
4-tap stride-1 conv over the d-interleaved (space-to-depth) input with
padding (1, 2). The folded kernel is just the 8x8 zero-padded 7x7 kernel
space-to-depth'd: K2[a, b, (d1 d2 c)] = Wpad[2a + d1, 2b + d2, c].

The fold is exact (same multiply-adds, reassociated), differentiable
(pure reshape/transpose of the stored 7x7 weights, done inside jit at
negligible cost), and checkpoint-compatible: the stored parameter stays
the reference-shaped (7, 7, C, 64) kernel.

A/B measurements (interleaved medians) live in PERF.md.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C); channel index (d1, d2, c)."""
    b, h, w, c = x.shape
    if h % block or w % block:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {block}")
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def fold_front_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Fold a (7, 7, C, O) stride-2 kernel to the equivalent (4, 4, 4C, O)
    stride-1 kernel over the space-to-depth input."""
    kh, kw, c, o = kernel.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"front fold expects a 7x7 kernel, got {kernel.shape}")
    wpad = jnp.zeros((8, 8, c, o), kernel.dtype).at[:7, :7].set(kernel)
    k2 = wpad.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return k2.reshape(4, 4, 4 * c, o)


def front_conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """Exact replacement for the front's
    conv7x7/s2(SAME) + bias on an even-sized NHWC input."""
    y = lax.conv_general_dilated(
        space_to_depth(x), fold_front_kernel(kernel).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(y.dtype)
