"""Flag ablation of the fused path at S4/256 @ 512^2 (VERDICT r2 Next #5
follow-up): the full default flag set measured -12.2% vs XLA there, and
the row-blocked kernel experiment (bench_rows_bneck_ab.py) showed fusing
the 128px levels themselves is a loss — so WHICH fused component loses
at 512^2, and is there a mixed config that beats plain XLA? If yes, the
"auto" backend should use it instead of falling back to flax entirely.

At 512^2: hourglass levels are 128/64/32/16/8 px (f1 on XLA via
fuse_max_h=64); heads run at 128^2 through the row-blocked head kernel.

Usage (real TPU): python scripts/ablate_fused_512.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.models.fused_inference import (  # noqa: E402
    fused_apply,
)
from single_person_pose_estimation_tpu.models.hourglass import (  # noqa: E402
    StackedHourglass,
)
from sweep_fused_generalization import condition  # noqa: E402

def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    B, hw = 32, 512
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    variables = condition(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), train=False))
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, hw, hw, 3))

    configs = {
        "xla": None,
        "lvl+pool+heads (default)": dict(fuse_levels=True,
                                         pool_fuse_max_h=32,
                                         fuse_heads=True),
        "bnecks only": dict(),
        "+levels": dict(fuse_levels=True),
        "+levels+pool": dict(fuse_levels=True, pool_fuse_max_h=32),
        "heads only": dict(fuse_heads=True),
    }

    fns = {}
    for name, flags in configs.items():
        if flags is None:
            f = jax.jit(lambda v, x, p: jnp.mean(
                model.apply(v, x * (1.0 + 1e-6 * p), train=False)[-1]))
        else:
            def f(v, x, p, flags=flags):
                return jnp.mean(fused_apply(
                    v, x * (1.0 + 1e-6 * p), num_stacks=4, **flags)[-1])
            f = jax.jit(f)
        t0 = time.time()
        float(f(variables, images, jnp.zeros(())))
        print(f"  compile {name}: {time.time() - t0:.0f}s", flush=True)
        fns[name] = f

    iters = 8
    results = {k: [] for k in fns}
    for _ in range(5):
        for name, f in fns.items():
            prev = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(iters):
                prev = f(variables, images, prev)
            float(prev)
            results[name].append(B * iters / (time.perf_counter() - t0))
    base = sorted(results["xla"])[2]
    print()
    for name, v in results.items():
        med = sorted(v)[2]
        print(f"{name:28s}: {med:7.1f} img/s ({(med / base - 1) * 100:+5.1f}%"
              " vs xla)", flush=True)


if __name__ == "__main__":
    main()
