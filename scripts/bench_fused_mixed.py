"""Model-level A/B of the fused-train kernel_backend mixes (v5e, B=64)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from single_person_pose_estimation_tpu.training import steps
from scripts.bench_bwd_variants import batch, fused_fwd_bwd_fn, fwd_bwd_fn, timeit
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

model = StackedHourglass(num_stacks=4, num_channels=256,
                         compute_dtype=jnp.bfloat16)
state = steps.TrainState.create(model, steps.make_optimizer(1e-3),
                                jax.random.PRNGKey(0))
imgs, hm = batch(64)
timeit("fwd+bwd b64 flax", fwd_bwd_fn(model), state.params,
       state.batch_stats, imgs, hm)
for kb in ("jnp", "mixed:8-16", "mixed:8-32", "mixed:4-16"):
    timeit(f"fwd+bwd b64 fused/{kb}", fused_fwd_bwd_fn(kernel_backend=kb),
           state.params, state.batch_stats, imgs, hm)
