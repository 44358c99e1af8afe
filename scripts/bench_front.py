"""How much of the fused-inference step is the XLA front module?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.models import fused_inference as fi
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

B = 128
model = StackedHourglass(num_stacks=4, num_channels=256,
                         compute_dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                       train=False)
params, stats = variables["params"], variables["batch_stats"]
images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

@jax.jit
def front_only(params, stats, x, prev):
    x = (x * (1.0 + 1e-6 * prev)).astype(jnp.bfloat16)
    y = jnp.maximum(fi._conv(params, x, "front_conv_1x1_1", stride=2), 0)
    y = fi._bn(params, stats, y, "front_conv_1x1_1_bn")
    c = params["front_bottleneck_3_conv_1x1_3"]["kernel"].shape[-1]
    y = fi._bottleneck_xla(params, stats, y, "front_bottleneck_1", c // 2)
    y = fi._maxpool(y)
    y = fi._bottleneck_xla(params, stats, y, "front_bottleneck_2", c // 2)
    y = fi._bottleneck_xla(params, stats, y, "front_bottleneck_3", c)
    return jnp.mean(y.astype(jnp.float32))

def timed(tag, f, *args, iters=20):
    prev = jnp.zeros(())
    prev = f(*args, prev); float(prev)
    prev = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        prev = f(*args, prev)
    float(prev)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.2f} ms/step", flush=True)

timed("front only (XLA) ", front_only, params, stats, images)

@jax.jit
def full(v, x, prev):
    img = x * (1.0 + 1e-6 * prev)
    out = fi.fused_apply(v, img, fuse_levels=True, pool_fuse_max_h=32,
                         fuse_heads=True)[-1]
    return jnp.mean(out)
timed("full fused step  ", full, variables, images)
