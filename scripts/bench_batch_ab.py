"""Interleaved A/B: bench batch 128 vs 256 on the default fused path."""
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

@jax.jit
def f(v, x, prev):
    img = x * (1.0 + 1e-6 * prev)
    out = fused_apply(v, img, fuse_levels=True, pool_fuse_max_h=32,
                      fuse_heads=True)[-1]
    return jnp.mean(out)

imgs = {B: jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))
        for B in (128, 256)}
for B in (128, 256):
    float(f(variables, imgs[B], jnp.zeros(())))

results = {128: [], 256: []}
for _ in range(6):
    for B in (128, 256):
        iters = 20 if B == 128 else 10
        prev = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            prev = f(variables, imgs[B], prev)
        float(prev)
        results[B].append(B * iters / (time.perf_counter() - t0))
for B in (128, 256):
    r = sorted(results[B])
    print(f"B={B}: median {r[len(r)//2]:.0f} img/s, "
          f"all {[round(v) for v in results[B]]}", flush=True)
