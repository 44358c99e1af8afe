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

# ---------------------------------------------------------------------------
# Open-loop load sweep (VERDICT r2 Next #8): a multi-client generator offers
# requests at a fixed rate regardless of completions (open loop — queueing
# delay shows up as latency, not reduced offered load); p50/p99 vs offered
# load, and a starvation check at saturation.
# ---------------------------------------------------------------------------
import threading


def open_loop(server, img, rate_hz, duration_s):
    lats = []
    lock = threading.Lock()
    futs = []
    stop = time.perf_counter() + duration_s
    nxt = time.perf_counter()
    n = 0
    while time.perf_counter() < stop:
        now = time.perf_counter()
        if now < nxt:
            time.sleep(min(nxt - now, 0.002))
            continue
        t_submit = time.perf_counter()
        fut = server.submit(img)

        def cb(_f, t=t_submit):
            # resolve time captured AT resolution, not at drain time
            with lock:
                lats.append(time.perf_counter() - t)

        fut.add_done_callback(cb)
        futs.append(fut)
        n += 1
        nxt += 1.0 / rate_hz
    for fut in futs:
        fut.result(timeout=120)  # starvation check: EVERY future resolves
    lats.sort()
    return n / duration_s, lats


def load_sweep():
    img8 = np.random.rand(256, 256, 3).astype(np.float32)
    for rate in (10, 25, 50, 100, 200):
        srv = PoseServer(model, variables["params"],
                         variables["batch_stats"],
                         buckets=(1, 8, 32, 128), max_wait_s=0.002)
        srv.warmup()
        offered, lats = open_loop(srv, img8, rate, duration_s=8.0)
        st = srv.stats()
        srv.close()
        p50 = lats[len(lats) // 2] * 1e3
        p99 = lats[int(len(lats) * 0.99)] * 1e3
        print(f"offered {rate:4d}/s -> achieved {st['served'] / 8.0:6.1f}/s"
              f"  p50 {p50:8.1f} ms  p99 {p99:8.1f} ms  "
              f"avg_batch {st['avg_batch']:.1f}  (all {len(lats)} resolved)",
              flush=True)


if os.environ.get("SERVE_SWEEP", "1") != "0":
    load_sweep()
