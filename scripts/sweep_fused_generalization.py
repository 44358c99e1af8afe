"""Fused-path generalization sweep on the REAL TPU (VERDICT r2 Next #5).

All round-2 TPU measurements and the pick_nimg/pool_fuse_max_h VMEM
heuristics were validated only at the flagship S4/256 @ 256^2, B 1..256.
This script covers the rest of the CLI-reachable config space:

  - S2/256 @ 256^2 (the reference's published Train.ipynb config),
  - S8/256 @ 256^2 (deepest stacking the CLI accepts),
  - S4/256 @ 512^2 (the f1 level doubles to 128 rows -> levels beyond the
    kernels' VMEM blocking must fall back to XLA, fuse_max_h),
  - B=1 single-image latency on the fused path at the flagship point.

For each: per-stack EQUALITY of the compiled fused path vs model.apply at
bf16 on CONDITIONED variables (BN variances lifted so the net is
contractive — at random init the multi-stack feedback is chaotic and any
two legitimate bf16 programs diverge; see validate_fused_tpu.py), then an
interleaved fused-vs-XLA throughput A/B (chained through a data
dependency, one readback — block_until_ready does not await remote
execution here).

Usage (real TPU): python scripts/sweep_fused_generalization.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.models.fused_inference import (  # noqa: E402
    fused_apply,
)
from single_person_pose_estimation_tpu.models.hourglass import (  # noqa: E402
    StackedHourglass,
)

COND_TOL = 1e-2
DEFAULT = dict(fuse_levels=True, pool_fuse_max_h=32, fuse_heads=True)
FAILURES = []
ROWS = []


def log(msg):
    print(msg, flush=True)


def condition(variables):
    return {
        "params": variables["params"],
        "batch_stats": {
            k: {"mean": v["mean"], "var": jnp.full_like(v["var"], 25.0)}
            for k, v in variables["batch_stats"].items()
        },
    }


def bench_pair(make_fused, make_xla, variables, images, iters, batch):
    """Interleaved A/B medians (run-to-run variance ~+-1.5%)."""
    fns = {"fused": make_fused, "xla": make_xla}
    for f in fns.values():
        float(f(variables, images, jnp.zeros(())))
    results = {"fused": [], "xla": []}
    for _ in range(5):
        for name, f in fns.items():
            prev = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(iters):
                prev = f(variables, images, prev)
            float(prev)
            results[name].append(batch * iters
                                 / (time.perf_counter() - t0))
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    return med["fused"], med["xla"]


def sweep_point(tag, num_stacks, hw, batch, iters=10):
    log(f"\n== {tag}: S{num_stacks}/256 @ {hw}^2, B={batch} ==")
    model = StackedHourglass(num_stacks=num_stacks, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    variables = condition(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), train=False))
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, hw, hw, 3))

    apply16 = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t0 = time.time()
    want = [np.asarray(o, np.float32) for o in apply16(variables, images)]
    log(f"  (xla compile+run {time.time() - t0:.0f}s)")
    t0 = time.time()
    got = fused_apply(variables, images, num_stacks=num_stacks, **DEFAULT)
    log(f"  (fused compile+run {time.time() - t0:.0f}s)")
    worst = 0.0
    for s in range(num_stacks):
        d = float(np.max(np.abs(np.asarray(got[s], np.float32) - want[s])))
        worst = max(worst, d)
        ok = d <= COND_TOL
        log(f"  equality stack{s}: max|d|={d:.3e} "
            f"{'PASS' if ok else '** FAIL **'}")
        if not ok:
            FAILURES.append((f"{tag} stack{s}", d))

    def make(fused):
        @jax.jit
        def f(v, x, prev):
            img = x * (1.0 + 1e-6 * prev)
            if fused:
                out = fused_apply(v, img, num_stacks=num_stacks,
                                  **DEFAULT)[-1]
            else:
                out = model.apply(v, img, train=False)[-1]
            return jnp.mean(out)
        return f

    f_ips, x_ips = bench_pair(make(True), make(False), variables, images,
                              iters, batch)
    log(f"  throughput: fused {f_ips:.0f} img/s vs xla {x_ips:.0f} img/s "
        f"({(f_ips / x_ips - 1) * 100:+.1f}%)")
    ROWS.append((tag, f"S{num_stacks}/256", f"{hw}^2", batch, worst,
                 f_ips, x_ips))
    return f_ips, x_ips


def b1_latency():
    """Flagship B=1: per-call latency, sequential submit->readback (the
    ~1 ms tunnel RTT is included — it is the serving floor here)."""
    log("\n== B=1 latency: S4/256 @ 256^2 ==")
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    variables = condition(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    for fused in (True, False):
        if fused:
            f = jax.jit(lambda v, x: fused_apply(v, x, **DEFAULT)[-1])
        else:
            f = jax.jit(lambda v, x: model.apply(v, x, train=False)[-1])
        np.asarray(f(variables, img))
        lats = []
        for _ in range(30):
            t0 = time.perf_counter()
            np.asarray(f(variables, img))  # full readback each call
            lats.append(time.perf_counter() - t0)
        lats.sort()
        log(f"  {'fused' if fused else 'xla  '}: p50 {lats[15] * 1e3:.1f} ms"
            f"  p99 {lats[-1] * 1e3:.1f} ms")


def main():
    log(f"device: {jax.devices()[0]}  backend: {jax.default_backend()}")
    sweep_point("S2@256", 2, 256, 128, iters=12)
    sweep_point("S8@256", 8, 256, 64, iters=8)
    sweep_point("S4@512", 4, 512, 32, iters=8)
    b1_latency()

    log("\n| point | model | input | B | worst max|d| | fused img/s "
        "| xla img/s |")
    log("|---|---|---|---|---|---|---|")
    for tag, m, i, b, d, f, x in ROWS:
        log(f"| {tag} | {m} | {i} | {b} | {d:.2e} | {f:.0f} | {x:.0f} |")
    if FAILURES:
        log(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    log("\nSWEEP PASS")


if __name__ == "__main__":
    main()
