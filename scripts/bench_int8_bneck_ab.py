"""A/B: the production bf16 fused_bottleneck vs an int8-MXU variant, at
the real hourglass level geometry (B=128, H=64..8, C=256, Cmid=128).

The int8 variant keeps the kernel structure identical (whole-image VMEM
blocks, 3x3 as 9 shifted matmuls) but runs every dot on the int8 MXU
path (v5e: 394.7 TOPS vs 197 TFLOPs bf16): weights pre-quantized
per-output-channel outside the kernel; activations quantized in-kernel
with one dynamic per-block scale per conv (max-abs, VPU). The 9 shifted
3x3 taps share t1's scale so their int32 accumulation is exact.

Timing: chained iterations inside one jit (out -> next in via a cheap
cast), warmup + timed runs each drained by a host readback (tunnel
methodology, PERF.md). Interleaved trials; medians reported.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (  # noqa: E402
    fused_bottleneck, pick_nimg,
)

INNER = 20


def _bneck_int8_kernel(x_ref, w1_ref, w2_ref, w3_ref, b_ref,
                       s1_ref, s2_ref, s3_ref,
                       a1_ref, c1_ref, a2_ref, c2_ref, a3_ref, c3_ref,
                       out_ref, *, N, H, W, Cin, Cmid):
    x = x_ref[...]                                   # (N, H, W, Cin) bf16
    xf = x.reshape(N * H * W, Cin).astype(jnp.float32)

    # conv1 (1x1): dynamic per-block activation scale; int8 MXU dot.
    sx = jnp.max(jnp.abs(xf)) * (1.0 / 127.0) + 1e-12
    xq = jnp.round(xf * (1.0 / sx)).astype(jnp.int8)
    z1 = jnp.dot(xq, w1_ref[...], preferred_element_type=jnp.int32)
    z1 = z1.astype(jnp.float32) * (sx * s1_ref[...]) + b_ref[0:1, :Cmid]
    t1 = jnp.maximum(z1, 0.0) * a1_ref[...] + c1_ref[...]

    # conv2 (3x3 as 9 shifted int8 matmuls, one shared activation scale —
    # the int32 accumulation across taps is then exact).
    st = jnp.max(jnp.abs(t1)) * (1.0 / 127.0) + 1e-12
    t1q = jnp.round(t1 * (1.0 / st)).astype(jnp.int8).reshape(N, H, W, Cmid)
    t1p = jnp.pad(t1q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((N * H * W, Cmid), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            sl = t1p[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cmid)
            acc = acc + jnp.dot(sl, w2_ref[dy, dx],
                                preferred_element_type=jnp.int32)
    z2 = acc.astype(jnp.float32) * (st * s2_ref[...]) + b_ref[1:2, :Cmid]
    t2 = jnp.maximum(z2, 0.0) * a2_ref[...] + c2_ref[...]

    # conv3 (1x1) + residual.
    s3a = jnp.max(jnp.abs(t2)) * (1.0 / 127.0) + 1e-12
    t2q = jnp.round(t2 * (1.0 / s3a)).astype(jnp.int8)
    z3 = jnp.dot(t2q, w3_ref[...], preferred_element_type=jnp.int32)
    z3 = z3.astype(jnp.float32) * (s3a * s3_ref[...]) + b_ref[2:3, :Cin]
    t3 = jnp.maximum(z3, 0.0) * a3_ref[...] + c3_ref[...]
    out = xf + t3
    out_ref[...] = out.astype(x.dtype).reshape(N, H, W, Cin)


def quant_w(w):
    """Per-output-channel symmetric int8: w (K, Cout) -> (wq, scale(1,Cout))."""
    s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)),
                keepdims=False) / 127.0 + 1e-12
    wq = jnp.round(w / s).astype(jnp.int8)
    return wq, s.reshape(1, -1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("nimg",))
def fused_bottleneck_int8(x, w1, b1, w2, b2, w3, b3,
                          a1, c1, a2, c2, a3, c3, nimg: int = 0):
    B, H, W, Cin = x.shape
    Cmid = w1.shape[1]
    dt = x.dtype
    N = nimg or pick_nimg(B, H, W)
    w1q, s1 = quant_w(w1)
    w3q, s3 = quant_w(w3)
    # 3x3: per-output-channel over (3,3,Cm) taps jointly (shared out scale).
    s2 = jnp.max(jnp.abs(w2), axis=(0, 1, 2)) / 127.0 + 1e-12
    w2q = jnp.round(w2 / s2).astype(jnp.int8)
    s2 = s2.reshape(1, -1).astype(jnp.float32)

    bmax = max(Cin, Cmid)
    b_tab = jnp.zeros((3, bmax), jnp.float32)
    b_tab = b_tab.at[0, :Cmid].set(b1.astype(jnp.float32))
    b_tab = b_tab.at[1, :Cmid].set(b2.astype(jnp.float32))
    b_tab = b_tab.at[2, :Cin].set(b3.astype(jnp.float32))

    kernel = partial(_bneck_int8_kernel, N=N, H=H, W=W, Cin=Cin, Cmid=Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [full()] * 13,
        out_specs=pl.BlockSpec((N, H, W, Cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1q, w2q, w3q, b_tab, s1, s2, s3,
      a1.reshape(1, -1).astype(jnp.float32),
      c1.reshape(1, -1).astype(jnp.float32),
      a2.reshape(1, -1).astype(jnp.float32),
      c2.reshape(1, -1).astype(jnp.float32),
      a3.reshape(1, -1).astype(jnp.float32),
      c3.reshape(1, -1).astype(jnp.float32))


def make_args(B, H, C=256):
    CM = C // 2
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    return dict(
        x=jax.random.normal(ks[0], (B, H, H, C), jnp.bfloat16) * 0.5,
        w1=jax.random.normal(ks[1], (C, CM)) * 0.05,
        b1=jax.random.normal(ks[2], (CM,)) * 0.05,
        w2=jax.random.normal(ks[3], (3, 3, CM, CM)) * 0.05,
        b2=jax.random.normal(ks[4], (CM,)) * 0.05,
        w3=jax.random.normal(ks[5], (CM, C)) * 0.05,
        b3=jax.random.normal(ks[6], (C,)) * 0.05,
        a1=jnp.ones((CM,)), c1=jnp.zeros((CM,)),
        a2=jnp.ones((CM,)), c2=jnp.zeros((CM,)),
        a3=jnp.ones((C,)), c3=jnp.zeros((C,)),
    )


ORDER = ("w1", "b1", "w2", "b2", "w3", "b3",
         "a1", "c1", "a2", "c2", "a3", "c3")


def chained(fn, args):
    vals = [args[k] for k in ORDER]
    x0 = args["x"]

    def step(x_):
        out = fn(x_, *vals)
        return (out * 0.3).astype(x_.dtype)

    def run(x_):
        for _ in range(INNER):
            x_ = step(x_)
        return x_
    return jax.jit(run), x0


def timed(f, x0):
    y = f(x0)
    _ = jax.device_get(y[0, 0, 0, 0])
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        y = f(x0)
        _ = jax.device_get(y[0, 0, 0, 0])
        times.append((time.perf_counter() - t0) / INNER)
    return sorted(times)[2]


def main():
    print("devices:", jax.devices())
    B = 128
    for H in (64, 32, 16, 8):
        args = make_args(B, H)
        fb, x0 = chained(lambda x, *v: fused_bottleneck(x, *v), args)
        fi, _ = chained(lambda x, *v: fused_bottleneck_int8(x, *v), args)
        # numerics check once
        yb = fused_bottleneck(args["x"], *[args[k] for k in ORDER])
        yi = fused_bottleneck_int8(args["x"], *[args[k] for k in ORDER])
        err = float(jnp.max(jnp.abs(yb.astype(jnp.float32)
                                    - yi.astype(jnp.float32))))
        # interleaved medians
        tb = timed(fb, x0)
        ti = timed(fi, x0)
        tb2 = timed(fb, x0)
        ti2 = timed(fi, x0)
        tbm, tim = min(tb, tb2), min(ti, ti2)
        flops = 2 * B * H * H * (256 * 128 + 9 * 128 * 128 + 128 * 256)
        print(f"H{H:3d}: bf16 {tbm*1e3:7.3f} ms ({flops/tbm/1e12:5.1f} TF) | "
              f"int8 {tim*1e3:7.3f} ms ({flops/tim/1e12:5.1f} TF) | "
              f"speedup {tbm/tim:5.2f}x | max|d| {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
