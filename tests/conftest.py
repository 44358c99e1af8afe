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

# Persistent compilation cache: repeated test runs skip recompiles (the
# multi-device CPU compiles dominate suite time on this 1-core host —
# a warm cache is the difference between ~2h and tens of minutes).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r4 Weak #7 / Next #8). The files below carry the
# expensive work — multi-device compiles, subprocess clusters, TF-oracle
# sessions, training loops — and are marked `full` at collection:
#
#   smoke tier:  python -m pytest tests/ -m "not full" -q   (<15 min target)
#   full tier:   python -m pytest tests/ -q                 (everything)
#
# Measured per-file durations: see CLAUDE.md "Workflow".
# ---------------------------------------------------------------------------

FULL_TIER_FILES = {
    "test_parallel.py",          # 8-device mesh + 2-process clusters
    "test_trainer.py",           # training loops incl. dp x tp mesh
    "test_pipeline.py",          # GPipe shard_map compiles
    "test_spatial.py",           # halo-exchange collectives
    "test_spatial_model.py",     # H-sharded full-model forwards
    "test_graft_entry.py",       # dryrun subprocesses (fresh compiles)
    "test_parity_vs_reference_source.py",  # flagship S4/256 Keras build
    "test_weight_import.py",     # TF/Keras sessions
    "test_weight_import_files.py",
    "test_tfrecord.py",          # TF both-direction oracle
    "test_end_to_end.py",        # smoke trainings
    "test_fused_train.py",       # fused-train equality compiles
    "test_fused_inference.py",   # fused-path interpret-mode kernels
    "test_augment.py",           # TF ImageProjectiveTransform oracle
    "test_examples.py",          # example scripts end to end
    "test_cli.py",               # CLI incl. serve/export end to end
    "test_losses.py",            # TF formula oracle session
    "test_eval.py",              # predict_ds integration + uint8 wire
    "test_grad_accum.py",        # accum-step scan compiles
    "test_serving_http.py",      # live HTTP server round trips
    # Measured into the full tier (pytest --durations, 2026-08-20):
    "test_model.py",             # ~10 min: grad-flow/remat/taps compiles
    "test_train_extras.py",      # ~4 min: EMA/schedule end-to-end trains
    "test_export.py",            # ~4 min: SavedModel/TFLite export
    "test_serving.py",           # ~4 min: PoseServer bucket compiles
    "test_space_to_depth.py",    # ~2 min: front-fold model equality
    "test_baseline_configs.py",  # ~1.5 min: S8 paper-config build
    "test_demo.py",              # ~1 min: checkpoint listing + predicts
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: expensive tier (multi-device compiles, clusters, TF "
        "oracles, trainings) — deselect with -m 'not full' for the "
        "smoke tier")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if os.path.basename(str(item.fspath)) in FULL_TIER_FILES:
            item.add_marker(_pytest.mark.full)
