"""Sweep batch size and kernel row-blocking on the default fused path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.models.fused_inference import fused_apply
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

model = StackedHourglass(num_stacks=4, num_channels=256,
                         compute_dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                       train=False)

def run(tag, B, iters=15, **kw):
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))
    @jax.jit
    def f(v, x, prev):
        img = x * (1.0 + 1e-6 * prev)
        out = fused_apply(v, img, fuse_levels=True, pool_fuse_max_h=32,
                          fuse_heads=True, **kw)[-1]
        return jnp.mean(out)
    prev = jnp.zeros(())
    prev = f(variables, images, prev); float(prev)
    prev = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        prev = f(variables, images, prev)
    float(prev)
    dt = time.perf_counter() - t0
    print(f"{tag}: {B*iters/dt:.0f} img/s", flush=True)

run("B=128 default      ", 128)
run("B=256 default      ", 256)
run("B=64  default      ", 64)
run("B=128 rows=8192    ", 128, bneck_rows=8192, uplevel_rows=8192)
run("B=128 rows=2048    ", 128, bneck_rows=2048, uplevel_rows=2048)
run("B=256 rows=8192    ", 256, bneck_rows=8192, uplevel_rows=8192)
