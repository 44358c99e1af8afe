"""A/B: row-blocked fused bottleneck (fused_bottleneck_rows) vs the XLA
chain at the levels whose whole map exceeds a VMEM block — the geometries
the production path currently leaves on XLA:

  * front_bottleneck_1 at 256^2 inputs: (B=128, 128, 128, C=128, Cm=64)
  * hourglass f1 level at 512^2 inputs: (B=32, 128, 128, C=256, Cm=128)
  * front_bottleneck_1 at 512^2 inputs: (B=32, 256, 256, C=128, Cm=64)

Chained iterations inside one jit, warmup + runs drained by host
readback (tunnel methodology, PERF.md); interleaved medians.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (  # noqa: E402
    fused_bottleneck_rows,
)

INNER = 20


def xla_bneck(x, w1, b1, w2, b2, w3, b3, a1, c1, a2, c2, a3, c3):
    dt = x.dtype

    def conv1x1(v, w, b):
        return jnp.einsum("bhwc,cd->bhwd", v, w.astype(dt)) + b.astype(dt)

    t1 = jnp.maximum(conv1x1(x, w1, b1), 0) * a1.astype(dt) + c1.astype(dt)
    t2 = lax.conv_general_dilated(
        t1, w2.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2.astype(dt)
    t2 = jnp.maximum(t2, 0) * a2.astype(dt) + c2.astype(dt)
    t3 = jnp.maximum(conv1x1(t2, w3, b3), 0) * a3.astype(dt) + c3.astype(dt)
    return x + t3


def make_args(B, H, C, dt=jnp.bfloat16):
    CM = C // 2
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    return dict(
        x=jax.random.normal(ks[0], (B, H, H, C), dt) * 0.5,
        w1=jax.random.normal(ks[1], (C, CM)) * 0.05,
        b1=jax.random.normal(ks[2], (CM,)) * 0.05,
        w2=jax.random.normal(ks[3], (3, 3, CM, CM)) * 0.05,
        b2=jax.random.normal(ks[4], (CM,)) * 0.05,
        w3=jax.random.normal(ks[5], (CM, C)) * 0.05,
        b3=jax.random.normal(ks[6], (C,)) * 0.05,
        a1=jnp.abs(jax.random.normal(ks[7], (CM,))) + 0.2,
        c1=jax.random.normal(ks[8], (CM,)) * 0.1,
        a2=jnp.abs(jax.random.normal(ks[9], (CM,))) + 0.2,
        c2=jax.random.normal(ks[10], (CM,)) * 0.1,
        a3=jnp.abs(jax.random.normal(ks[11], (C,))) + 0.2,
        c3=jax.random.normal(ks[12], (C,)) * 0.1,
    )


ORDER = ("w1", "b1", "w2", "b2", "w3", "b3",
         "a1", "c1", "a2", "c2", "a3", "c3")


def chained(fn, args):
    vals = [args[k] for k in ORDER]
    x0 = args["x"]

    def run(x_):
        for _ in range(INNER):
            x_ = (fn(x_, *vals) * 0.3).astype(x_.dtype)
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
    cases = [("front_b1 @256^2", 128, 128, 128),
             ("f1 lvl   @512^2", 32, 128, 256),
             ("front_b1 @512^2", 32, 256, 128)]
    for name, B, H, C in cases:
        args = make_args(B, H, C)
        fx, x0 = chained(xla_bneck, args)
        fns = {"xla": fx}
        for hb in (16, 32, 64):
            fr, _ = chained(
                lambda x, *v, hb=hb: fused_bottleneck_rows(x, *v, hb=hb),
                args)
            fns[f"rows{hb}"] = fr
        # numerics once (bf16 band)
        yx = xla_bneck(args["x"], *[args[k] for k in ORDER])
        yr = fused_bottleneck_rows(args["x"], *[args[k] for k in ORDER],
                                   hb=32)
        err = float(jnp.max(jnp.abs(yx.astype(jnp.float32)
                                    - yr.astype(jnp.float32))))
        # interleaved: two passes, keep min
        res = {}
        for _pass in range(2):
            for k, f in fns.items():
                t = timed(f, x0)
                res[k] = min(res.get(k, 1e9), t)
        base = res["xla"]
        line = f"{name} (B{B} H{H} C{C}): xla {base*1e3:7.3f} ms | " + " | ".join(
            f"{k} {v*1e3:7.3f} ms ({base/v:4.2f}x)"
            for k, v in res.items() if k != "xla")
        print(line + f" | bf16 max|d| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
