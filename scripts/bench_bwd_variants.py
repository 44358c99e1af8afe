"""Chase the backward pass (the train-step bottleneck: fwd+bwd 131 ms vs
fwd 37.5 ms at B=64 — scripts/bench_train_parts.py). Variants isolate BN
batch-statistics backprop, rematerialization, batch scaling, and dtype;
cost_analysis says whether the program is FLOPs- or HBM-bound."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu import losses
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.ops.heatmap import render_heatmaps_batch
from single_person_pose_estimation_tpu.training import steps

ITERS = 12


def timeit(name, fn, *args, B=64):
    out = fn(*args)
    jax.block_until_ready(out)
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


def fwd_bwd_fn(model, train_bn=True, loss=losses.iou):
    def f(params, stats, images, heatmaps):
        def loss_fn(p):
            if train_bn:
                outs, _ = model.apply({"params": p, "batch_stats": stats},
                                      images, train=True,
                                      mutable=["batch_stats"])
            else:
                outs = model.apply({"params": p, "batch_stats": stats},
                                   images, train=False)
            return jnp.sum(jnp.stack([loss(heatmaps, o).mean()
                                      for o in outs]))
        l, g = jax.value_and_grad(loss_fn)(params)
        return l, g
    return jax.jit(f)


def fused_fwd_bwd_fn(num_stacks=4, compute_dtype=jnp.bfloat16,
                     loss=losses.iou, kernel_backend="auto"):
    from single_person_pose_estimation_tpu.experimental.fused_train import (
        fused_train_apply,
    )

    def f(params, stats, images, heatmaps):
        def loss_fn(p):
            outs, _ = fused_train_apply(
                {"params": p, "batch_stats": stats}, images,
                num_stacks=num_stacks, compute_dtype=compute_dtype,
                kernel_backend=kernel_backend)
            return jnp.sum(jnp.stack([loss(heatmaps, o).mean()
                                      for o in outs]))
        return jax.value_and_grad(loss_fn)(params)
    return jax.jit(f)


def batch(B, key=1):
    imgs = jax.random.uniform(jax.random.PRNGKey(key), (B, 256, 256, 3),
                              jnp.float32)
    hm = render_heatmaps_batch(
        jax.random.uniform(jax.random.PRNGKey(2), (B, 17)) * 64,
        jax.random.uniform(jax.random.PRNGKey(3), (B, 17)) * 64,
        jnp.full((B, 17), 2, jnp.int32), height=64, width=64)
    return imgs, hm


def main():
    bf16 = StackedHourglass(num_stacks=4, num_channels=256,
                            compute_dtype=jnp.bfloat16)
    state = steps.TrainState.create(bf16, steps.make_optimizer(1e-3),
                                    jax.random.PRNGKey(0))
    imgs, hm = batch(64)

    base = fwd_bwd_fn(bf16)
    timeit("fwd+bwd b64 bf16 (baseline)", base, state.params,
           state.batch_stats, imgs, hm)

    lowered = base.lower(state.params, state.batch_stats, imgs, hm)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"cost_analysis: {flops/1e12:.2f} TFLOP, "
          f"{bytes_/1e9:.2f} GB accessed "
          f"(arith intensity {flops/max(bytes_,1):.1f} flop/byte)",
          flush=True)

    timeit("fwd+bwd b64 frozen-BN", fwd_bwd_fn(bf16, train_bn=False),
           state.params, state.batch_stats, imgs, hm)

    fused = fused_fwd_bwd_fn()
    timeit("fwd+bwd b64 fused-bwd", fused, state.params,
           state.batch_stats, imgs, hm)
    ca_f = fused.lower(state.params, state.batch_stats, imgs,
                       hm).compile().cost_analysis()
    print(f"fused cost_analysis: {ca_f.get('flops', 0)/1e12:.2f} TFLOP, "
          f"{ca_f.get('bytes accessed', 0)/1e9:.2f} GB accessed",
          flush=True)

    remat = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16, remat=True)
    timeit("fwd+bwd b64 remat", fwd_bwd_fn(remat), state.params,
           state.batch_stats, imgs, hm)

    imgs32, hm32 = batch(32)
    timeit("fwd+bwd b32 bf16", base, state.params, state.batch_stats,
           imgs32, hm32, B=32)
    imgs128, hm128 = batch(128)
    timeit("fwd+bwd b128 bf16", base, state.params, state.batch_stats,
           imgs128, hm128, B=128)
    timeit("fwd+bwd b128 remat", fwd_bwd_fn(remat), state.params,
           state.batch_stats, imgs128, hm128, B=128)

    f32 = StackedHourglass(num_stacks=4, num_channels=256)
    timeit("fwd+bwd b64 fp32", fwd_bwd_fn(f32), state.params,
           state.batch_stats, imgs, hm)

    timeit("fwd+bwd b64 mse-loss", fwd_bwd_fn(bf16, loss=losses.mse),
           state.params, state.batch_stats, imgs, hm)


if __name__ == "__main__":
    main()
