"""Packaging contract: the project is pip-installable and an installed copy
keeps its capabilities.

The reference is a clone-and-run notebook repo (README.md:14 "argparse has
not been supported yet"); a framework must also work as an installed
package. These tests pin the wheel metadata in pyproject.toml against the
package, and that the native C++ sources ship INSIDE the package so
pip-installed copies can build the fast TFRecord reader
(data/tfrecord.py::_try_build_native)."""

import os

try:
    import tomllib  # Python >= 3.11
except ImportError:  # pragma: no cover - 3.10 floor (requires-python)
    import pytest

    tomllib = pytest.importorskip(
        "tomli", reason="pyproject parsing needs tomllib (3.11+) or tomli")

import single_person_pose_estimation_tpu as spe

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "single_person_pose_estimation_tpu")


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_version_matches_package():
    assert _pyproject()["project"]["version"] == spe.__version__


def test_cli_entry_point_resolves():
    proj = _pyproject()
    target = proj["project"]["scripts"]["spe-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_native_sources_ship_inside_the_package():
    # The wheel's package-data globs must actually match files on disk.
    proj = _pyproject()
    data = proj["tool"]["setuptools"]["package-data"]
    assert "native/*.cpp" in data["single_person_pose_estimation_tpu"]
    assert os.path.exists(os.path.join(PKG, "native", "tfrecord_io.cpp"))
    assert os.path.exists(os.path.join(PKG, "native", "Makefile"))
    assert os.path.exists(
        os.path.join(PKG, "data", "get_data.sh"))


def test_build_native_finds_in_package_sources(monkeypatch, tmp_path):
    """_try_build_native must locate the in-package native dir (the layout
    an installed wheel has — no repo-root native/ shim)."""
    from single_person_pose_estimation_tpu.data import tfrecord

    calls = []

    def fake_run(cmd, **kwargs):
        calls.append(cmd)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(tfrecord, "_build_attempted", False)
    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    tfrecord._try_build_native()
    assert len(calls) == 1
    built_dir = os.path.normpath(calls[0][-1])
    assert built_dir == os.path.normpath(os.path.join(PKG, "native"))
