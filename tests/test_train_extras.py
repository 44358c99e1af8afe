"""Training extras beyond the reference: lr schedules (warmup/cosine) and
the Polyak EMA of params tracked inside opt_state (checkpoints for free).
The reference trains fixed-lr Keras sessions (trainer.py:31) and has
neither."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu import losses
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.training import steps


def _small_cfg():
    return Config().replace(
        image_height=64, image_width=64, label_height=16, label_width=16,
        hg_num_stacks=1, hg_num_channels=16)


def _batch(cfg, b=4, seed=1):
    k = jax.random.PRNGKey(seed)
    return {
        "image": jax.random.uniform(k, (b, cfg.image_height,
                                        cfg.image_width, 3)),
        "kx": jnp.full((b, 17), 5.0),
        "ky": jnp.full((b, 17), 9.0),
        "kv": jnp.full((b, 17), 2, jnp.int32),
    }


def test_lr_schedule_values():
    # constant is the reference semantics
    assert steps.make_lr_schedule(1e-3) == 1e-3
    # constant + warmup ramps 0 -> lr
    s = steps.make_lr_schedule(1e-2, warmup_steps=10)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-6)
    # cosine: 0 -> peak at warmup -> ~0 at total_steps
    c = steps.make_lr_schedule(1e-2, "cosine", total_steps=100,
                               warmup_steps=10)
    np.testing.assert_allclose(float(c(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(c(10)), 1e-2, rtol=1e-5)
    assert float(c(100)) < 1e-4
    with pytest.raises(ValueError, match="total_steps"):
        steps.make_lr_schedule(1e-2, "cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        steps.make_lr_schedule(1e-2, "bogus")


def test_ema_tracks_params():
    cfg = _small_cfg()
    model = StackedHourglass(num_stacks=1, num_channels=16)
    tx = steps.make_optimizer(1e-2, ema_decay=0.5)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    init_params = jax.tree.map(np.asarray, state.params)
    # At init the EMA IS the init params.
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 init_params, steps.get_ema_params(state.opt_state))
    step = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                 augment=False)
    batch = _batch(cfg)
    for _ in range(3):
        state, _ = step(state, batch)
    ema = steps.get_ema_params(state.opt_state)
    # EMA moved off the init but lags the live params (decay > 0).
    d_init = jax.tree.leaves(jax.tree.map(
        lambda e, i: float(np.abs(np.asarray(e) - i).max()), ema,
        init_params))
    d_live = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        ema, state.params))
    assert max(d_init) > 0
    assert max(d_live) > 0
    # decay=0 adopts the live params exactly each step.
    tx0 = steps.make_optimizer(1e-2, ema_decay=0.0)
    state0 = steps.TrainState.create(model, tx0, jax.random.PRNGKey(0),
                                     input_shape=(1, 64, 64, 3))
    step0 = steps.make_train_step(model, tx0, losses.weighted_mse, cfg,
                                  augment=False)
    state0, _ = step0(state0, batch)
    jax.tree.map(
        lambda e, p: np.testing.assert_allclose(
            np.asarray(e), np.asarray(p), atol=1e-7),
        steps.get_ema_params(state0.opt_state), state0.params)


def test_ema_validation_and_missing():
    with pytest.raises(ValueError, match="decay"):
        steps.ema_of_params(1.0)
    tx = steps.make_optimizer(1e-3)  # no EMA
    model = StackedHourglass(num_stacks=1, num_channels=16)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    with pytest.raises(ValueError, match="no EMA"):
        steps.get_ema_params(state.opt_state)


def test_trainer_ema_schedule_end_to_end(tmp_path):
    from single_person_pose_estimation_tpu.data import coco, pipeline
    from single_person_pose_estimation_tpu.training.trainer import Trainer
    from test_data import make_synthetic_coco

    root = str(tmp_path / "dataset")
    make_synthetic_coco(root, "train2017", n_images=3, people_per=2)
    make_synthetic_coco(root, "val2017", n_images=2, people_per=1)
    cfg = _small_cfg().replace(
        dataset_dir=root, temporary_dir=str(tmp_path / "temp"),
        batch_size=2, num_examples_per_record=5, shuffle_buffer=8,
        async_checkpointing=False)
    coco.gen_trainval_records(cfg)
    model = StackedHourglass(num_stacks=1, num_channels=16)
    t = Trainer(model, pipeline.DatasetBuilder(cfg), 2, 1e-3, "mse", cfg,
                augment=False, lr_schedule="cosine", warmup_steps=1,
                ema_decay=0.9)
    try:
        t.train()
        ema = t.get_ema_params()
        # EMA survives the checkpoint round trip (it lives in opt_state).
        t.state, _ = t.ckpt.restore(t.state)
        restored = t.get_ema_params()
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), ema, restored)
        # Swapping EMA params in for eval produces finite heatmaps.
        out = model.apply({"params": restored,
                           "batch_stats": t.state.batch_stats},
                          jnp.zeros((1, 64, 64, 3)), train=False)[-1]
        assert np.isfinite(np.asarray(out)).all()
        # The external loader reads the meta FIRST and rebuilds the
        # matching opt_state tree (cosine schedule + EMA component) with
        # no knowledge from the caller.
        from single_person_pose_estimation_tpu.utils.model_utils import (
            load_model_from_checkpoint,
        )
        st2, meta = load_model_from_checkpoint(
            model, cfg.checkpoints_path, best=True,
            input_shape=(1, 64, 64, 3))
        assert meta["ema_decay"] == 0.9
        assert meta["lr_schedule"] == "cosine"
        ema2 = steps.get_ema_params(st2.opt_state)
        assert np.isfinite(
            np.asarray(jax.tree.leaves(ema2)[0], np.float32)).all()
    finally:
        t.close()
