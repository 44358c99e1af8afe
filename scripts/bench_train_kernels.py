"""Micro-bench the train-mode bottleneck kernels vs their XLA chains at
the flagship 64x64 geometry. Iterations are CHAINED INSIDE one jit
(square C->C convs so outputs feed back) — per-call remote dispatch on
the tunneled TPU is ~1 ms, which would otherwise swamp the kernel."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.experimental import (
    bottleneck_train_kernel as ker,
)

B, H, W, C = 64, 64, 64, 256
dt = jnp.bfloat16
INNER = 16


def timed(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    per = (time.perf_counter() - t0) / iters / INNER
    # bytes: read x + write a per inner step (bf16)
    gb = (2 * B * H * W * C * 2) / 1e9
    print(f"{name}: {per*1e3:.3f} ms/op ({gb/per:.0f} GB/s eff)",
          flush=True)
    return per


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), dt)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (C, C), jnp.float32) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, C, C),
                           jnp.float32) * 0.05
    b = jnp.zeros((C,))
    sc = jnp.ones((C,), jnp.float32)
    sh = jnp.zeros((C,), jnp.float32)

    @jax.jit
    def xla_1x1_loop(x):
        def body(i, carry):
            x_, s_ = carry
            a = jnp.maximum(jnp.dot(x_, w1.astype(dt)) + b.astype(dt), 0)
            a32 = a.astype(jnp.float32)
            st = jnp.stack([a32.sum((0, 1, 2)), (a32 * a32).sum((0, 1, 2))])
            return a * 0.5, s_ + st
        return jax.lax.fori_loop(0, INNER, body,
                                 (x, jnp.zeros((2, C), jnp.float32)))

    @partial(jax.jit, static_argnames=("n",))
    def pallas_1x1_loop(x, n):
        def body(i, carry):
            x_, s_ = carry
            a, st = ker.conv1x1_relu_stats(x_, w1, b, nimg=n)
            return a * 0.5, s_ + st
        return jax.lax.fori_loop(0, INNER, body,
                                 (x, jnp.zeros((2, C), jnp.float32)))

    @jax.jit
    def xla_3x3_loop(x):
        def body(i, carry):
            x_, s_ = carry
            z = (x_.astype(jnp.float32) * sc + sh).astype(dt)
            y = jax.lax.conv_general_dilated(
                z, w2.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = jnp.maximum(y + b.astype(dt), 0)
            a32 = a.astype(jnp.float32)
            st = jnp.stack([a32.sum((0, 1, 2)), (a32 * a32).sum((0, 1, 2))])
            return a * 0.1, s_ + st
        return jax.lax.fori_loop(0, INNER, body,
                                 (x, jnp.zeros((2, C), jnp.float32)))

    @partial(jax.jit, static_argnames=("n",))
    def pallas_3x3_loop(x, n):
        def body(i, carry):
            x_, s_ = carry
            a, st = ker.conv3x3_relu_stats(x_, w2, b, sc, sh, nimg=n)
            return a * 0.1, s_ + st
        return jax.lax.fori_loop(0, INNER, body,
                                 (x, jnp.zeros((2, C), jnp.float32)))

    timed("xla    1x1+relu+stats", xla_1x1_loop, x)
    timed("pallas 1x1+relu+stats n1", pallas_1x1_loop, x, 1)
    timed("xla    aff+3x3+relu+stats", xla_3x3_loop, x)
    timed("pallas aff+3x3+relu+stats n1", pallas_3x3_loop, x, 1)


if __name__ == "__main__":
    main()
