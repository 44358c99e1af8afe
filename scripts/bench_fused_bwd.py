"""Measure the hand-fused bottleneck backward (models/fused_train.py) vs
the flax/XLA-autodiff train path on the real TPU: fwd+bwd and the full
train step, B=64 and B=128."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu import losses
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.training import steps
from scripts.bench_bwd_variants import (batch, fused_fwd_bwd_fn, fwd_bwd_fn,
                                        timeit)


def main():
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
    cfg = Config()

    for B in (64, 128):
        imgs, hm = batch(B)
        timeit(f"fwd+bwd b{B} flax", fwd_bwd_fn(model), state.params,
               state.batch_stats, imgs, hm, B=B)
        for kb in ("jnp", "pallas"):
            fused = fused_fwd_bwd_fn(kernel_backend=kb)
            timeit(f"fwd+bwd b{B} fused/{kb}", fused, state.params,
                   state.batch_stats, imgs, hm, B=B)
            ca = fused.lower(state.params, state.batch_stats, imgs,
                             hm).compile().cost_analysis()
            print(f"  fused/{kb} b{B}: {ca.get('flops',0)/1e12:.2f} TFLOP, "
                  f"{ca.get('bytes accessed',0)/1e9:.2f} GB", flush=True)

    B = 64
    kx = jax.random.uniform(jax.random.PRNGKey(2), (B, 17)) * 64
    ky = jax.random.uniform(jax.random.PRNGKey(3), (B, 17)) * 64
    tb = {"image": jax.random.uniform(jax.random.PRNGKey(1),
                                      (B, 256, 256, 3)),
          "kx": kx, "ky": ky, "kv": jnp.full((B, 17), 2, jnp.int32)}
    for backend in ("flax", "fused"):
        step = steps.make_train_step(model, tx, losses.iou, cfg,
                                     augment=True, model_backend=backend)
        # Fresh state per backend: the step donates its input state, so
        # the first call invalidates whatever we pass in.
        st = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))

        def run(st_):
            s, m = step(st_, tb)
            return s, m

        s, m = run(st)
        jax.block_until_ready(m["loss"])
        float(m["loss"])
        t0 = time.perf_counter()
        ITERS = 12
        for _ in range(ITERS):
            s, m = run(s)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"full step b{B} {backend}: {dt*1e3:.2f} ms "
              f"({B/dt:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
