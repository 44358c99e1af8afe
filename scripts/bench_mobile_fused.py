"""A/B: mobile (separable-conv) hourglass — Pallas mobile-fused path vs
plain XLA model.apply, on the real TPU at the flagship geometry.

Round-2 measured the mobile variant at 2,329 img/s on XLA — SLOWER than
the 2.4x-FLOPs standard model's fused path (3,100), because depthwise
convs bypass the MXU and leave XLA HBM/VPU-bound. The mobile Pallas
kernel (ops/pallas/mobile_kernel.py) keeps each bottleneck in VMEM:
1x1 depthwise scales folded into the pointwise matmuls, the 3x3
depthwise as 9 VPU multiply-adds.

Interleaved medians, chained iterations, host-readback drain (PERF.md).
Also asserts bf16 equality on conditioned variables per stack.
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
from sweep_fused_generalization import condition  # noqa: E402

COND_TOL = 1e-2


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    B, hw, stacks = 128, 256, 4
    model = StackedHourglass(num_stacks=stacks, num_channels=256,
                             mobile=True, compute_dtype=jnp.bfloat16)
    variables = condition(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), train=False))
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, hw, hw, 3))

    apply_xla = jax.jit(lambda v, x: model.apply(v, x, train=False))
    want = [np.asarray(o, np.float32) for o in apply_xla(variables, images)]
    got = fused_apply(variables, images, num_stacks=stacks, mobile=True,
                      fuse_levels=True, pool_fuse_max_h=32, fuse_heads=True)
    failed = False
    for s in range(stacks):
        d = float(np.max(np.abs(np.asarray(got[s], np.float32) - want[s])))
        ok = d <= COND_TOL
        failed = failed or not ok
        print(f"equality stack{s}: max|d|={d:.3e} "
              f"{'PASS' if ok else '** FAIL **'}", flush=True)

    def make(fused):
        @jax.jit
        def f(v, x, prev):
            img = x * (1.0 + 1e-6 * prev)
            if fused:
                out = fused_apply(v, img, num_stacks=stacks, mobile=True,
                                  fuse_levels=True, pool_fuse_max_h=32,
                                  fuse_heads=True)[-1]
            else:
                out = model.apply(v, img, train=False)[-1]
            return jnp.mean(out)
        return f

    fns = {"fused": make(True), "xla": make(False)}
    for f in fns.values():
        float(f(variables, images, jnp.zeros(())))
    iters = 10
    results = {k: [] for k in fns}
    for _ in range(5):
        for name, f in fns.items():
            prev = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(iters):
                prev = f(variables, images, prev)
            float(prev)
            results[name].append(B * iters / (time.perf_counter() - t0))
    med = {k: sorted(v)[2] for k, v in results.items()}
    print(f"\nmobile fused: {med['fused']:.0f} img/s | mobile xla: "
          f"{med['xla']:.0f} img/s ({(med['fused']/med['xla']-1)*100:+.1f}%)",
          flush=True)
    if failed:
        print("EQUALITY FAILED — the throughput above is NOT validated",
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
