"""Interleaved A/B: space-to-depth front fold off vs on (VERDICT r2 Next
#4): (a) the default fused inference path at B=128, (b) the full train
step at B=64. Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.models.fused_inference import fused_apply
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass


def bench_inference():
    B = 128
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)), train=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

    def make(s2d):
        @jax.jit
        def f(v, x, prev):
            img = x * (1.0 + 1e-6 * prev)
            out = fused_apply(v, img, fuse_levels=True, pool_fuse_max_h=32,
                              fuse_heads=True, front_s2d=s2d)[-1]
            return jnp.mean(out)
        return f

    fns = {0: make(False), 1: make(True)}
    for f in fns.values():
        float(f(variables, images, jnp.zeros(())))
    results = {0: [], 1: []}
    for _ in range(6):
        for d in (0, 1):
            prev = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(15):
                prev = fns[d](variables, images, prev)
            float(prev)
            results[d].append(B * 15 / (time.perf_counter() - t0))
    for d in (0, 1):
        r = sorted(results[d])
        print(f"inference front_s2d={d}: median {r[len(r)//2]:.0f} img/s, "
              f"all {[round(v) for v in results[d]]}", flush=True)


def bench_train():
    from single_person_pose_estimation_tpu import losses
    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )
    from single_person_pose_estimation_tpu.training import steps

    B = 64
    cfg = Config()
    data = {
        "image": jax.random.uniform(jax.random.PRNGKey(1),
                                    (B, 256, 256, 3), jnp.float32),
        "kx": jax.random.uniform(jax.random.PRNGKey(2), (B, 17)) * 64,
        "ky": jax.random.uniform(jax.random.PRNGKey(3), (B, 17)) * 64,
        "kv": jnp.full((B, 17), 2, jnp.int32),
    }

    runs = {}
    for s2d in (False, True):
        model = StackedHourglass(num_stacks=4, num_channels=256,
                                 compute_dtype=jnp.bfloat16, front_s2d=s2d)
        tx = steps.make_optimizer(1e-3)
        state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
        step = steps.make_train_step(model, tx, losses.iou, cfg,
                                     augment=True)
        state, m = step(state, data)
        float(m["loss"])
        runs[s2d] = (step, state)

    results = {False: [], True: []}
    for _ in range(5):
        for s2d in (False, True):
            step, state = runs[s2d]
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = step(state, data)
            float(m["loss"])
            results[s2d].append(B * 10 / (time.perf_counter() - t0))
            runs[s2d] = (step, state)
    for s2d in (False, True):
        r = sorted(results[s2d])
        print(f"train front_s2d={int(s2d)}: median {r[len(r)//2]:.0f} "
              f"img/s, all {[round(v) for v in results[s2d]]}", flush=True)


if __name__ == "__main__":
    bench_inference()
    if os.environ.get("S2D_TRAIN", "1") != "0":
        bench_train()
