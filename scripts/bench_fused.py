"""TPU A/B bench: XLA inference vs Pallas fused_apply variants.

Run on the real TPU (no platform forcing). Chained-dependency timing per
bench.py methodology. Usage: python scripts/bench_fused.py [variant ...]
variants: xla, fused_n1 (round-1 per-image grid), fused_auto (batch-blocked).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.models.fused_inference import fused_apply

import os as _os
B = int(_os.environ.get("BENCH_B", "128"))
ITERS = 20


def main():
    variants = sys.argv[1:] or ["xla", "fused_auto"]
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32),
                           train=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3),
                                jnp.float32)

    def run(name, fwd):
        @jax.jit
        def step(variables, images, prev):
            img = images * (1.0 + 1e-6 * prev)
            return jnp.mean(fwd(variables, img)[-1].astype(jnp.float32))

        prev = jnp.zeros(())
        t0 = time.perf_counter()
        prev = step(variables, images, prev)
        float(prev)
        print(f"{name}: warmup (compile+run) {time.perf_counter()-t0:.1f}s",
              flush=True)
        prev = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(ITERS):
            prev = step(variables, images, prev)
        float(prev)
        dt = time.perf_counter() - t0
        print(f"{name}: {B*ITERS/dt:.1f} img/s ({dt/ITERS*1e3:.2f} ms/step)",
              flush=True)

    for v in variants:
        if v == "xla":
            run("xla", lambda vr, im: model.apply(vr, im, train=False))
        elif v == "fused_auto":
            run("fused_auto", lambda vr, im: fused_apply(
                vr, im, num_stacks=4, fuse_levels=True))
        elif v == "fused_nolevels":
            run("fused_nolevels", lambda vr, im: fused_apply(
                vr, im, num_stacks=4, fuse_levels=False))
        elif v.startswith("rows"):
            # rows<bneck>x<uplevel>[p<pool_max_h>], e.g. rows4096x4096p32
            spec = v[4:]
            heads = spec.endswith("h")
            if heads:
                spec = spec[:-1]
            pool_h = 0
            if "p" in spec:
                spec, ph = spec.split("p")
                pool_h = int(ph)
            br, ur = spec.split("x")
            run(v, lambda vr, im, br=int(br), ur=int(ur), ph=pool_h, fh=heads:
                fused_apply(vr, im, num_stacks=4, fuse_levels=True,
                            bneck_rows=br, uplevel_rows=ur,
                            pool_fuse_max_h=ph, fuse_heads=fh))
        else:
            print("unknown variant", v)


if __name__ == "__main__":
    main()
