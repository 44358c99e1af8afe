"""CLI unit tests: override parsing, dispatch wiring, error paths."""

import pytest

from single_person_pose_estimation_tpu import cli
from single_person_pose_estimation_tpu.configs.default_config import Config


def test_apply_overrides_types():
    cfg = cli._apply_overrides(Config(), [
        "hg_num_stacks=4", "learning_rate=0.001", "mobile=true",
        "dataset_dir=/tmp/x", "async_checkpointing=false",
    ])
    assert cfg.hg_num_stacks == 4
    assert cfg.learning_rate == 0.001
    assert cfg.mobile is True
    assert cfg.dataset_dir == "/tmp/x"
    assert cfg.async_checkpointing is False


def test_apply_overrides_unknown_field():
    with pytest.raises(SystemExit, match="unknown config field"):
        cli._apply_overrides(Config(), ["bogus=1"])


def test_build_model_from_config():
    import jax.numpy as jnp

    m = cli._build_model(Config().replace(hg_num_stacks=3,
                                          hg_num_channels=32,
                                          compute_dtype="float32"))
    assert m.num_stacks == 3
    assert m.num_channels == 32
    assert m.compute_dtype == jnp.float32
    m2 = cli._build_model(Config())
    assert m2.compute_dtype == jnp.bfloat16


def test_parser_subcommands():
    parser_error = False
    try:
        cli.main(["definitely-not-a-command"])
    except SystemExit:
        parser_error = True
    assert parser_error


def test_eval_flags_present():
    # argparse wiring: flags parse without executing (fn raises on missing
    # checkpoints, which is the expected failure point).
    with pytest.raises(FileNotFoundError):
        cli.main(["--set", "temporary_dir=/nonexistent-xyz",
                  "--set", "hg_num_channels=8",
                  "--set", "image_height=64", "--set", "image_width=64",
                  "eval", "--latest", "--recalibrate-batches", "2",
                  "--conf-threshold", "0.2"])
