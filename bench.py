"""Benchmark: 256x256 stacked-hourglass inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only published throughput — 89 ms/step at batch 16
with `model.evaluate` on a Tesla P100 (Train.ipynb cell 27) ~= 180 images/s.
That figure is for the 2-stack model; we benchmark the FLAGSHIP 4-stack /
256-channel model (the published-best S4 config, ~2x the FLOPs) and still
compare against the 180 img/s number, which makes vs_baseline conservative.
Target (BASELINE.json): >= 10x per chip.

Methodology note: each iteration's input depends on the previous output
(un-foldable scalar coupling) and the loop is drained by a single host
readback at the end — `block_until_ready` alone does not guarantee remote
execution completed on tunneled TPU runtimes, and independent iterations
can otherwise overlap or be elided.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 180.0  # P100, 2-stack, batch 16 (Train.ipynb cell 27)


def bench_inference(num_stacks=4, num_channels=256, batch=128, iters=20,
                    compute_dtype=jnp.bfloat16):
    """Default path: Pallas-fused inference (models/fused_inference.py) —
    batch-blocked bottleneck/uplevel kernels, pool fusion at the <=32px
    levels, fused head + inter-stack glue. Measured (v5e, S4/256, B=128,
    bf16): ~3080-3130 img/s vs 2348 for the plain XLA model (+33%);
    equality tested in tests/test_fused_inference.py. The fuse_bottom
    subtree megakernel measured a ~0.7% LOSS in an interleaved A/B
    (3059 vs 3079 median) and stays off — see bottom_kernel.py."""
    from single_person_pose_estimation_tpu.models.fused_inference import (
        fused_apply,
    )
    from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

    model = StackedHourglass(num_stacks=num_stacks, num_channels=num_channels,
                             compute_dtype=compute_dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32),
                           train=False)

    @jax.jit
    def forward_dep(variables, images, prev):
        # Chain iterations through a scalar so no call can be elided/overlapped.
        img = images * (1.0 + 1e-6 * prev)
        out = fused_apply(variables, img, num_stacks=num_stacks,
                          compute_dtype=compute_dtype, fuse_levels=True,
                          pool_fuse_max_h=32, fuse_heads=True)[-1]
        return jnp.mean(out)

    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, 256, 256, 3), jnp.float32)
    prev = jnp.zeros(())
    prev = forward_dep(variables, images, prev)
    float(prev)  # warmup: compile + full execution drain

    prev = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        prev = forward_dep(variables, images, prev)
    float(prev)  # drain the dependency chain
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_train_step(batch=64, iters=12):
    """Full fused training-step throughput (augment + heatmap targets +
    fwd/bwd + Adam in one XLA program). Always reported (VERDICT.md Next
    #4); the persistent compile cache keeps repeat runs fast. Disable with
    BENCH_TRAIN=0 if a cold cache must be avoided."""
    from single_person_pose_estimation_tpu import losses
    from single_person_pose_estimation_tpu.configs.default_config import Config
    from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
    from single_person_pose_estimation_tpu.training import steps

    cfg = Config()
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
    data = {
        "image": jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.float32)),
        "kx": jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(2), (batch, 17)) * 64),
        "ky": jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(3), (batch, 17)) * 64),
        "kv": jax.device_put(jnp.full((batch, 17), 2, jnp.int32)),
    }
    train_step = steps.make_train_step(model, tx, losses.iou, cfg,
                                       augment=True)
    state, m = train_step(state, data)
    float(m["loss"])  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = train_step(state, data)
    float(m["loss"])
    return batch * iters / (time.perf_counter() - t0)


def main():
    import os

    # Persistent compile cache keeps repeat bench runs fast (first compile of
    # the S4 model through the TPU tunnel can take minutes).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    batch = 128
    ips = bench_inference(batch=batch)
    result = {
        "metric": "hourglass_s4_256x256_inference_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/s",
        "vs_baseline": round(ips / BASELINE_IMG_PER_S, 2),
        "batch": batch,
        "device": str(jax.devices()[0]),
    }
    if os.environ.get("BENCH_TRAIN") != "0":
        result["train_images_per_sec_b64"] = round(bench_train_step(64), 1)
        result["train_images_per_sec_b128"] = round(bench_train_step(128), 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
