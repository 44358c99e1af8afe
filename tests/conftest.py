"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip (pjit/shard_map) code paths are exercised on CPU via XLA host
device spoofing, per the multi-chip test strategy in SURVEY.md §4.

Note: this environment may import jax at interpreter startup (sitecustomize
registering a TPU PJRT plugin), which latches JAX_PLATFORMS before conftest
runs — so the platform is forced via jax.config.update, which works even
after import, rather than via environment variables.
"""

import os

# Must be set before the first backend initialization (lazy, so still
# effective even though jax may already be imported).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
