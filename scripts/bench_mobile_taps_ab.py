"""Interleaved A/B: mobile depthwise lowering 'conv' (grouped conv,
XLA's off-MXU special case) vs 'taps' (shifted per-channel multiply-adds,
models/hourglass.py::_DepthwiseTaps) on the MOBILE variant:

  (a) full train step @ B=64  — the path the taps lowering targets
      (PERF.md: mobile train 421.9 img/s < standard 464.5 because the
      grouped depthwise conv bypasses the MXU; a Pallas train kernel is
      expected to lose the custom-call-boundary way, but a pure-XLA
      re-lowering keeps global scheduling);
  (b) plain-XLA eval forward @ B=128 — secondary: the fused mobile Pallas
      path already owns inference, this just locates where taps sits.

Run on the real TPU. Same-weights equality is asserted by
tests/test_model.py::test_mobile_depthwise_taps_*.

TAPS_IMPLS selects the lowerings to interleave (default "conv,taps";
"conv,dense" A/Bs the block-diagonal MXU lowering — _DepthwiseDense).
TAPS_EVAL=0 skips the eval-forward leg.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

IMPLS = tuple(os.environ.get("TAPS_IMPLS", "conv,taps").split(","))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass


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
    for impl in IMPLS:
        model = StackedHourglass(num_stacks=4, num_channels=256,
                                 compute_dtype=jnp.bfloat16, mobile=True,
                                 mobile_depthwise=impl)
        tx = steps.make_optimizer(1e-3)
        state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
        step = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                     augment=True)
        state, m = step(state, data)
        float(m["loss"])
        runs[impl] = (step, state)

    results = {i: [] for i in IMPLS}
    for _ in range(6):
        for impl in IMPLS:
            step, state = runs[impl]
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = step(state, data)
            float(m["loss"])
            results[impl].append(B * 10 / (time.perf_counter() - t0))
            runs[impl] = (step, state)
    for impl in IMPLS:
        r = sorted(results[impl])
        print(f"mobile train depthwise={impl}: median {r[len(r)//2]:.1f} "
              f"img/s, all {[round(v) for v in results[impl]]}", flush=True)


def bench_eval_forward():
    B = 128
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

    fns = {}
    variables = None
    for impl in IMPLS:
        model = StackedHourglass(num_stacks=4, num_channels=256,
                                 compute_dtype=jnp.bfloat16, mobile=True,
                                 mobile_depthwise=impl)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 256, 256, 3)), train=False)

        @jax.jit
        def f(v, x, prev, model=model):
            img = x * (1.0 + 1e-6 * prev)
            out = model.apply(v, img, train=False)[-1]
            return jnp.mean(out)

        float(f(variables, images, jnp.zeros(())))
        fns[impl] = f

    results = {i: [] for i in IMPLS}
    for _ in range(6):
        for impl in IMPLS:
            prev = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(15):
                prev = fns[impl](variables, images, prev)
            float(prev)
            results[impl].append(B * 15 / (time.perf_counter() - t0))
    for impl in IMPLS:
        r = sorted(results[impl])
        print(f"mobile XLA eval depthwise={impl}: median "
              f"{r[len(r)//2]:.0f} img/s, "
              f"all {[round(v) for v in results[impl]]}", flush=True)


if __name__ == "__main__":
    bench_train()
    if os.environ.get("TAPS_EVAL", "1") != "0":
        bench_eval_forward()
