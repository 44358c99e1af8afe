"""Driver-contract regression tests for __graft_entry__.py.

Round-1 failure mode (VERDICT.md Weak #1): the driver invokes
dryrun_multichip directly, in a fresh interpreter, with NO env pre-set —
sitecustomize latches the axon TPU platform and the function saw 1 device.
These tests reproduce the driver's exact invocation in a subprocess, so any
regression in the self-configuration path fails here first.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_clean_subprocess(code: str) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        # Strip everything conftest.py set up: the function must
        # self-configure the spoofed CPU mesh (VERDICT.md Next #1).
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        # The dryrun now also compiles the GPipe and halo-conv programs;
        # cold compiles on a single contended CPU core can exceed 900s.
        # dryrun_multichip enables a persistent compile cache, so only the
        # first-ever run pays this.
        timeout=2400,
    )


def test_dryrun_multichip_self_configures():
    # Exactly the driver's call: import the function, call it with n=8.
    proc = _run_in_clean_subprocess(
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
    assert "dp x tp" in proc.stdout  # 8 devices -> 2-D (data, model) mesh


def test_dryrun_multichip_after_backend_initialized():
    # Worst case: the caller already initialized a backend (e.g. ran
    # entry() on the TPU first). _force_cpu_mesh must clear + reconfigure.
    #
    # The jax.devices() probe initializes the DEFAULT backend — on this
    # box that is the remote axon TPU. If its tunnel is down, devices()
    # blocks forever and this test would burn its whole 2400s timeout
    # and report a false failure — probe cheaply first and skip instead.
    import pytest

    if not _probe_default_backend():
        pytest.skip("default backend (axon tunnel) unreachable — "
                    "the clear+reconfigure path needs a live backend "
                    "to initialize first")
    proc = _run_in_clean_subprocess(
        "import jax\n"
        "jax.devices()\n"  # force backend init on whatever platform
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def _probe_default_backend(timeout_s: int = 90) -> bool:
    """True if `jax.devices()` completes in a fresh interpreter within
    timeout_s (i.e. the default backend — possibly a tunneled TPU — is
    actually reachable)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s, env=env)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def test_bench_main_survives_auxiliary_section_failures(monkeypatch, capsys):
    """Driver contract: bench.py must print its ONE JSON line (with the
    headline inference metric) even when the auxiliary train/records
    sections fail — a transient tunnel error there must not cost the
    round its benchmark artifact."""
    import json

    import jax

    import bench

    monkeypatch.setattr(bench, "bench_inference", lambda batch: 1234.5)

    def boom(*a, **k):
        raise RuntimeError("transient tunnel failure")

    monkeypatch.setattr(bench, "bench_mobile_inference", boom)
    monkeypatch.setattr(bench, "bench_train_step", boom)
    monkeypatch.setattr(bench, "bench_train_from_records", boom)
    monkeypatch.setattr(bench, "bench_eval_section", boom)
    # bench.main() points the persistent compile cache at the bench dir;
    # restore the suite's cache config afterwards.
    old_cache = jax.config.jax_compilation_cache_dir
    try:
        bench.main()
    finally:
        jax.config.update("jax_compilation_cache_dir", old_cache)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["value"] == 1234.5
    assert result["metric"].endswith("images_per_sec_per_chip")
    assert "mobile_bench_error" in result
    assert "train_bench_error" in result
    assert "records_bench_error" in result
    assert "eval_bench_error" in result
