"""Decompose train-step time on the real TPU: augment+render | fwd(train) |
fwd+bwd | +Adam full step. Chained-dependency timing per bench.py."""

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
from single_person_pose_estimation_tpu.ops.augment import augment_batch
from single_person_pose_estimation_tpu.ops.heatmap import render_heatmaps_batch
from single_person_pose_estimation_tpu.training import steps

B = int(os.environ.get("BENCH_B", "64"))
ITERS = 12


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    # drain via a scalar readback
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms ({B/dt:.0f} img/s)", flush=True)
    return dt


def main():
    cfg = Config()
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1),
                                    (B, 256, 256, 3), jnp.float32),
        "kx": jax.random.uniform(jax.random.PRNGKey(2), (B, 17)) * 64,
        "ky": jax.random.uniform(jax.random.PRNGKey(3), (B, 17)) * 64,
        "kv": jnp.full((B, 17), 2, jnp.int32),
    }

    @jax.jit
    def aug_render(rng, images, kx, ky, kv):
        images, kx, ky, kv = augment_batch(
            rng, images, kx, ky, kv, label_size=64,
            flip_pairs=cfg.flip_pairs, geometric_backend="matmul2pass")
        hm = render_heatmaps_batch(kx, ky, kv, height=64, width=64)
        return images, hm

    rng = jax.random.PRNGKey(9)
    timeit("augment+render", aug_render, rng, batch["image"], batch["kx"],
           batch["ky"], batch["kv"])

    imgs = batch["image"]
    hm = render_heatmaps_batch(batch["kx"], batch["ky"], batch["kv"],
                               height=64, width=64)

    @jax.jit
    def fwd_train(params, stats, images):
        outs, mut = model.apply({"params": params, "batch_stats": stats},
                                images, train=True, mutable=["batch_stats"])
        return outs[-1]

    timeit("fwd (train mode)", fwd_train, state.params, state.batch_stats,
           imgs)

    @jax.jit
    def fwd_eval(params, stats, images):
        return model.apply({"params": params, "batch_stats": stats},
                           images, train=False)[-1]

    timeit("fwd (eval mode)", fwd_eval, state.params, state.batch_stats,
           imgs)

    @jax.jit
    def fwd_bwd(params, stats, images, heatmaps):
        def loss_fn(p):
            outs, mut = model.apply({"params": p, "batch_stats": stats},
                                    images, train=True,
                                    mutable=["batch_stats"])
            ls = [losses.iou(heatmaps, o).mean() for o in outs]
            return jnp.sum(jnp.stack(ls)), mut["batch_stats"]

        (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return l, g

    timeit("fwd+bwd", fwd_bwd, state.params, state.batch_stats, imgs, hm)

    train_step = steps.make_train_step(model, tx, losses.iou, cfg,
                                       augment=True)
    state2, m = train_step(state, batch)
    jax.block_until_ready(m["loss"])
    float(m["loss"])
    t0 = time.perf_counter()
    s = state2
    for _ in range(ITERS):
        s, m = train_step(s, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"full step: {dt*1e3:.2f} ms ({B/dt:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
