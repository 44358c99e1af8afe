"""Serving-path latency/throughput on the real TPU: PoseServer with the
fused inference path, single-request latency and saturated throughput."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.serving import PoseServer

model = StackedHourglass(num_stacks=4, num_channels=256,
                         compute_dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                       train=False)
server = PoseServer(model, variables["params"], variables["batch_stats"],
                    buckets=(1, 8, 32, 128), max_wait_s=0.002)
print("warmup (compiles 4 buckets)...", flush=True)
server.warmup()
img = np.random.rand(256, 256, 3).astype(np.float32)

# Single-request latency (sequential).
lats = []
for _ in range(30):
    t0 = time.perf_counter()
    server.submit(img).result()
    lats.append(time.perf_counter() - t0)
lats.sort()
print(f"b1 latency: p50 {lats[15]*1e3:.1f} ms, p99 {lats[-1]*1e3:.1f} ms",
      flush=True)

# Saturated throughput: pump many requests.
N = 2048
t0 = time.perf_counter()
futs = [server.submit(img) for _ in range(N)]
for f in futs:
    f.result()
dt = time.perf_counter() - t0
st = server.stats()
print(f"saturated: {N/dt:.0f} img/s, avg_batch {st['avg_batch']:.1f}, "
      f"p50 {st['latency_p50_ms']:.1f} ms", flush=True)
server.close()
