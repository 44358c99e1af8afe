"""XLA compiler-option A/B on the real TPU: can option overrides move the
HBM-bound full train step (~470 img/s, 27% MXU) or the fused inference
path (~3,100 img/s)?

Rationale: every algorithmic lever on the train step has measured a loss
(PERF.md: remat, custom_vjp, Pallas train kernels, s2d, depthwise
re-lowerings) — the one untried axis is the compiler's own scheduling
dials, forwarded per-jit via jax.jit(compiler_options=...). Candidates:

  - xla_tpu_scoped_vmem_limit_kib: the VMEM budget the fusion/scheduling
    passes may assume; more scoped VMEM can admit larger fusions (less
    HBM traffic), less can improve double-buffering headroom.
  - xla_tpu_enable_latency_hiding_scheduler: toggles the LHS pass; mostly
    a collectives lever, but it reorders DMA/compute overlap generally.

Interleaved medians (6 rounds x 10 steps), same methodology as the other
A/B scripts. Usage:
  FLAGS_TARGET=train|infer python scripts/bench_xla_flags_ab.py
Variants that the PJRT backend rejects are reported as FAILED, not fatal.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VARIANTS = {
    "baseline": None,
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
}


def build_train_runs(B=64):
    from single_person_pose_estimation_tpu import losses
    from single_person_pose_estimation_tpu.configs.default_config import Config
    from single_person_pose_estimation_tpu.models.hourglass import (
        StackedHourglass,
    )
    from single_person_pose_estimation_tpu.training import steps

    cfg = Config()
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    tx = steps.make_optimizer(1e-3)
    data = {
        "image": jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (B, 256, 256, 3), jnp.float32)),
        "kx": jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(2), (B, 17)) * 64),
        "ky": jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(3), (B, 17)) * 64),
        "kv": jax.device_put(jnp.full((B, 17), 2, jnp.int32)),
    }

    runs = {}
    for name, opts in VARIANTS.items():
        try:
            step = steps.make_train_step(model, tx, losses.iou, cfg,
                                         augment=True,
                                         compiler_options=opts)
            state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
            state, m = step(state, dict(data))
            float(m["loss"])
            runs[name] = (step, state)
            print(f"train variant {name}: compiled OK", flush=True)
        except Exception as e:
            print(f"train variant {name}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    def measure(name, n=10):
        step, state = runs[name]
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, dict(data))
        float(m["loss"])
        runs[name] = (step, state)
        return B * n / (time.perf_counter() - t0)

    return runs, measure


def build_infer_runs(B=128):
    from single_person_pose_estimation_tpu.models.fused_inference import (
        fused_apply,
    )
    from single_person_pose_estimation_tpu.models.hourglass import (
        StackedHourglass,
    )

    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32),
                           train=False)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (B, 256, 256, 3), jnp.float32)

    def forward_dep(variables, images, prev):
        img = images * (1.0 + 1e-6 * prev)
        out = fused_apply(variables, img, num_stacks=4,
                          compute_dtype=jnp.bfloat16, fuse_levels=True,
                          pool_fuse_max_h=32, fuse_heads=True)[-1]
        return jnp.mean(out)

    runs = {}
    for name, opts in VARIANTS.items():
        try:
            f = jax.jit(forward_dep, compiler_options=opts)
            float(f(variables, images, jnp.zeros(())))
            runs[name] = f
            print(f"infer variant {name}: compiled OK", flush=True)
        except Exception as e:
            print(f"infer variant {name}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    def measure(name, n=15):
        prev = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(n):
            prev = runs[name](variables, images, prev)
        float(prev)
        return B * n / (time.perf_counter() - t0)

    return runs, measure


def main():
    target = os.environ.get("FLAGS_TARGET", "train")
    print(f"devices: {jax.devices()}  target: {target}", flush=True)
    runs, measure = (build_train_runs() if target == "train"
                     else build_infer_runs())
    results = {name: [] for name in runs}
    for _ in range(6):
        for name in runs:
            results[name].append(measure(name))
    for name, vals in results.items():
        r = sorted(vals)
        print(f"{target} {name}: median {r[len(r)//2]:.1f} img/s, "
              f"all {[round(v, 1) for v in vals]}", flush=True)


if __name__ == "__main__":
    main()
