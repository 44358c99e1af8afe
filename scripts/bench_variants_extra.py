"""Throughput for the remaining first-class paths: the mobile (separable
conv) variant and the fused predict+decode eval path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.evaluation.predict import (
    make_predict_decode_fn,
)
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

B = 128
images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

def timed(tag, f, *args, iters=20):
    prev = jnp.zeros(())
    prev = f(*args, prev); float(prev)
    prev = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        prev = f(*args, prev)
    float(prev)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.2f} ms ({B/dt:.0f} img/s)", flush=True)

# Mobile variant (separable convs; plain XLA path — the fused kernels
# target the standard conv bottlenecks).
mobile = StackedHourglass(num_stacks=4, num_channels=256, mobile=True,
                          compute_dtype=jnp.bfloat16)
vm = mobile.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                 train=False)
n_params = sum(x.size for x in jax.tree.leaves(vm["params"]))
print(f"mobile params: {n_params:,}", flush=True)

@jax.jit
def mobile_fwd(v, x, prev):
    img = x * (1.0 + 1e-6 * prev)
    return jnp.mean(mobile.apply(v, img, train=False)[-1])
timed("mobile S4/256 inference (XLA)", mobile_fwd, vm, images)

# Fused predict + on-device decode (the eval/serving compute path).
model = StackedHourglass(num_stacks=4, num_channels=256,
                         compute_dtype=jnp.bfloat16)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
               train=False)
fn = make_predict_decode_fn(model)

@jax.jit
def pred_dec(params, stats, x, prev):
    img = x * (1.0 + 1e-6 * prev)
    kps = fn(params, stats, img)
    return jnp.sum(kps[..., 2].astype(jnp.float32)) * 1e-6
timed("predict+decode (XLA model)  ", pred_dec, v["params"],
      v["batch_stats"], images)

# Fused predict + decode (the default eval path on TPU after wiring
# make_predict_decode_fn through fused_apply).
fn_fused = make_predict_decode_fn(model, use_fused=True)

@jax.jit
def pred_dec_fused(params, stats, x, prev):
    img = x * (1.0 + 1e-6 * prev)
    kps = fn_fused(params, stats, img)
    return jnp.sum(kps[..., 2].astype(jnp.float32)) * 1e-6
timed("predict+decode (fused path) ", pred_dec_fused, v["params"],
      v["batch_stats"], images)
