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


def test_serve_end_to_end(tmp_path):
    """cli serve: checkpoint -> PoseServer over a glob of jpegs -> JSON."""
    import json

    import jax
    import numpy as np

    from single_person_pose_estimation_tpu.data.images import encode_jpeg
    from single_person_pose_estimation_tpu.training import steps
    from single_person_pose_estimation_tpu.training.checkpoint import (
        CheckpointManager,
    )

    cfg_sets = ["--set", f"temporary_dir={tmp_path}",
                "--set", "hg_num_stacks=1", "--set", "hg_num_channels=8",
                "--set", "image_height=64", "--set", "image_width=64",
                "--set", "label_height=16", "--set", "label_width=16",
                "--set", "async_checkpointing=false"]
    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )

    cfg = cli._apply_overrides(Config(), [a for a in cfg_sets
                                          if a != "--set"])
    model = cli._build_model(cfg)
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    mgr = CheckpointManager(cfg.checkpoints_path, async_checkpointing=False)
    mgr.save(epoch=1, state=state, meta={"val_loss": 1.0})
    if hasattr(mgr, "close"):
        mgr.close()

    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        (tmp_path / f"img{i}.jpg").write_bytes(encode_jpeg(img))

    out = tmp_path / "kp.json"
    cli.main(cfg_sets + ["serve", "--images", str(tmp_path / "*.jpg"),
                         "--save-path", str(out), "--latest",
                         "--buckets", "1", "2",
                         "--transfer-dtype", "float32"])
    records = json.loads(out.read_text())
    assert len(records) == 3
    for kps in records.values():
        arr = np.asarray(kps)
        assert arr.shape == (17, 3)
        assert np.isfinite(arr).all()


def test_export_end_to_end(tmp_path):
    """cli export: checkpoint -> Orbax artifact + TFLite flatbuffer (the
    mobile variant's edge-deployment path), plus the no-op error path."""
    import jax
    import numpy as np
    import pytest

    pytest.importorskip("tensorflow")
    from single_person_pose_estimation_tpu.training import steps
    from single_person_pose_estimation_tpu.training.checkpoint import (
        CheckpointManager,
    )
    from single_person_pose_estimation_tpu.utils.export import (
        load_inference_artifact,
    )

    cfg_sets = ["--set", f"temporary_dir={tmp_path}",
                "--set", "hg_num_stacks=1", "--set", "hg_num_channels=8",
                "--set", "image_height=64", "--set", "image_width=64",
                "--set", "label_height=16", "--set", "label_width=16",
                "--set", "mobile=true", "--set", "compute_dtype=float32",
                "--set", "async_checkpointing=false"]
    cfg = cli._apply_overrides(Config(), [a for a in cfg_sets
                                          if a != "--set"])
    model = cli._build_model(cfg)
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    mgr = CheckpointManager(cfg.checkpoints_path, async_checkpointing=False)
    mgr.save(epoch=1, state=state, meta={"val_loss": 1.0})
    if hasattr(mgr, "close"):
        mgr.close()

    artifact = tmp_path / "artifact"
    tflite = tmp_path / "model.tflite"
    cli.main(cfg_sets + ["export", "--latest",
                         "--artifact", str(artifact),
                         "--tflite", str(tflite),
                         "--quantize", "dynamic"])
    assert tflite.stat().st_size > 0
    model2, _, predict = load_inference_artifact(str(artifact))
    assert model2.mobile is True
    y = predict(np.zeros((1, 64, 64, 3), np.float32))
    assert y.shape == (1, 16, 16, 17)

    with pytest.raises(SystemExit, match="nothing to do"):
        cli.main(cfg_sets + ["export", "--latest"])


def test_export_ema_params(tmp_path):
    """export --ema writes the Polyak-averaged params, not the live ones;
    --ema on a non-EMA checkpoint fails with a clear error."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from single_person_pose_estimation_tpu.training import steps
    from single_person_pose_estimation_tpu.training.checkpoint import (
        CheckpointManager,
    )
    from single_person_pose_estimation_tpu.utils.export import (
        load_inference_artifact,
    )

    cfg_sets = ["--set", f"temporary_dir={tmp_path}",
                "--set", "hg_num_stacks=1", "--set", "hg_num_channels=8",
                "--set", "image_height=64", "--set", "image_width=64",
                "--set", "label_height=16", "--set", "label_width=16",
                "--set", "compute_dtype=float32",
                "--set", "async_checkpointing=false"]
    cfg = cli._apply_overrides(Config(), [a for a in cfg_sets
                                          if a != "--set"])
    model = cli._build_model(cfg)
    tx = steps.make_optimizer(1e-3, ema_decay=0.9)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    # Shift the live params off the EMA (which still holds the init
    # values) so the two are distinguishable without training.
    state = state.replace(
        params=jax.tree.map(lambda p: p + 1.0, state.params))
    mgr = CheckpointManager(cfg.checkpoints_path, async_checkpointing=False)
    mgr.save(epoch=1, state=state,
             meta={"val_loss": 1.0, "ema_decay": 0.9})
    if hasattr(mgr, "close"):
        mgr.close()

    artifact = tmp_path / "artifact_ema"
    cli.main(cfg_sets + ["export", "--latest", "--ema",
                         "--artifact", str(artifact)])
    _, variables, _ = load_inference_artifact(str(artifact))
    ema = steps.get_ema_params(state.opt_state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(variables["params"])[0], np.float32),
        np.asarray(jax.tree.leaves(ema)[0], np.float32))
    # And NOT the live (shifted) params.
    assert not np.allclose(
        np.asarray(jax.tree.leaves(variables["params"])[0], np.float32),
        np.asarray(jax.tree.leaves(state.params)[0], np.float32))

    # Non-EMA checkpoint: --ema must fail clearly, before writing.
    cfg2_sets = [s.replace(str(tmp_path), str(tmp_path / "b"))
                 for s in cfg_sets]
    cfg2 = cli._apply_overrides(Config(), [a for a in cfg2_sets
                                           if a != "--set"])
    tx2 = steps.make_optimizer(1e-3)
    state2 = steps.TrainState.create(model, tx2, jax.random.PRNGKey(0),
                                     input_shape=(1, 64, 64, 3))
    mgr2 = CheckpointManager(cfg2.checkpoints_path,
                             async_checkpointing=False)
    mgr2.save(epoch=1, state=state2, meta={"val_loss": 1.0})
    if hasattr(mgr2, "close"):
        mgr2.close()
    with pytest.raises(ValueError, match="EMA"):
        cli.main(cfg2_sets + ["export", "--latest", "--ema",
                              "--artifact", str(tmp_path / "b" / "art")])


def test_build_model_front_s2d_dial():
    """Config.front_s2d: default off (the A/B measured a wash, PERF.md),
    auto = TPU-only (off on the CPU test backend), on/off force the flag,
    anything else is rejected."""
    import pytest

    from single_person_pose_estimation_tpu import cli
    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )

    assert Config().front_s2d == "off"
    assert cli._build_model(Config()).front_s2d is False
    assert cli._build_model(
        Config().replace(front_s2d="auto")).front_s2d is False  # auto, CPU
    assert cli._build_model(
        Config().replace(front_s2d="on")).front_s2d is True
    assert cli._build_model(
        Config().replace(front_s2d="off")).front_s2d is False
    with pytest.raises(ValueError, match="front_s2d"):
        cli._build_model(Config().replace(front_s2d="yes"))
