"""A/B the fuse_bottom megakernel on the default fused inference path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.models.fused_inference import fused_apply
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

B = 128
model = StackedHourglass(num_stacks=4, num_channels=256,
                         compute_dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                       train=False)
images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

def run(tag, **kw):
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
    for _ in range(20):
        prev = f(variables, images, prev)
    float(prev)
    dt = time.perf_counter() - t0
    print(f"{tag}: {B*20/dt:.0f} img/s", flush=True)

run("default           ")
run("+fuse_bottom      ", fuse_bottom=True)
