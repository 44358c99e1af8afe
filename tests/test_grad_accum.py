"""Gradient accumulation (make_train_step(accum_steps=N)).

The reference trains at a fixed batch 16 on one GPU (trainer.py:49) and
has no accumulation; this is the standard large-effective-batch recipe
for memory-bound configs (S8, 512² inputs). Semantics pinned here:

  * frozen BN  -> one accumulated step IS the full-batch step (exact up
    to float reassociation), because no layer couples examples.
  * batch BN   -> each microbatch normalizes by its own statistics and
    running stats chain through the scan (documented divergence).
"""

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
        hg_num_stacks=2, hg_num_channels=16)


def _make(cfg, seed=0):
    model = StackedHourglass(num_stacks=cfg.hg_num_stacks,
                             num_channels=cfg.hg_num_channels)
    tx = steps.make_optimizer(1e-2)
    state = steps.TrainState.create(
        model, tx, jax.random.PRNGKey(seed),
        input_shape=(1, cfg.image_height, cfg.image_width, 3))
    return model, tx, state


def _batch(cfg, b=8, seed=1):
    k = jax.random.PRNGKey(seed)
    return {
        "image": jax.random.uniform(k, (b, cfg.image_height,
                                        cfg.image_width, 3)),
        "kx": jnp.tile(jnp.linspace(2.0, 13.0, 17)[None], (b, 1)),
        "ky": jnp.tile(jnp.linspace(3.0, 12.0, 17)[None], (b, 1)),
        "kv": jnp.full((b, 17), 2, jnp.int32),
    }


def test_accum_matches_full_batch_with_frozen_bn():
    cfg = _small_cfg()
    model, tx, state = _make(cfg)
    batch = _batch(cfg, b=8)

    step1 = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                  augment=False, bn_mode="frozen")
    step4 = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                  augment=False, bn_mode="frozen",
                                  accum_steps=4)
    # The step donates its state buffers: give each call its own copy.
    s1, m1 = step1(jax.tree.map(jnp.array, state), batch)
    s4, m4 = step4(jax.tree.map(jnp.array, state), batch)
    # Same total loss and per-stack metrics (mean over equal microbatches
    # == full-batch mean), same params after the single Adam update.
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-6)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m4[k]), rtol=1e-5,
                                   err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        s1.params, s4.params)


def test_accum_batch_bn_trains_and_updates_stats():
    cfg = _small_cfg()
    model, tx, state = _make(cfg)
    batch = _batch(cfg, b=8)
    step = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                 augment=False, accum_steps=2)
    stats_before = jax.tree.map(np.asarray, state.batch_stats)
    first = None
    for _ in range(4):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    # Running stats moved (chained through the microbatch scan).
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()),
        stats_before, state.batch_stats))
    assert max(moved) > 0


def test_accum_with_augmentation_runs():
    cfg = _small_cfg()
    model, tx, state = _make(cfg)
    batch = _batch(cfg, b=4)
    step = steps.make_train_step(model, tx, losses.iou, cfg,
                                 augment=True, accum_steps=2)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_accum_under_dp_mesh():
    from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib

    cfg = _small_cfg()
    model, tx, state = _make(cfg)
    mesh = mesh_lib.create_mesh()  # 8 spoofed CPU devices
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    batch = mesh_lib.shard_batch(_batch(cfg, b=16), mesh)
    step = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                 mesh=mesh, augment=False, accum_steps=2)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_accum_validation_errors():
    cfg = _small_cfg()
    model, tx, state = _make(cfg)
    with pytest.raises(ValueError, match="accum_steps"):
        steps.make_train_step(model, tx, losses.mse, cfg, accum_steps=0)
    step = steps.make_train_step(model, tx, losses.mse, cfg,
                                 augment=False, accum_steps=3)
    with pytest.raises(ValueError, match="divisible"):
        step(state, _batch(cfg, b=8))  # 8 % 3 != 0, caught at trace


def test_trainer_accepts_accum_steps(tmp_path):
    from single_person_pose_estimation_tpu.data import coco, pipeline
    from single_person_pose_estimation_tpu.training.trainer import Trainer
    from test_data import make_synthetic_coco

    root = str(tmp_path / "dataset")
    make_synthetic_coco(root, "train2017", n_images=3, people_per=2)
    make_synthetic_coco(root, "val2017", n_images=2, people_per=1)
    cfg = Config().replace(
        dataset_dir=root, temporary_dir=str(tmp_path / "temp"),
        batch_size=4, num_examples_per_record=5, shuffle_buffer=8,
        hg_num_stacks=1, hg_num_channels=16,
        image_height=64, image_width=64, label_height=16, label_width=16,
        async_checkpointing=False)
    coco.gen_trainval_records(cfg)
    model = StackedHourglass(num_stacks=1, num_channels=16)
    t = Trainer(model, pipeline.DatasetBuilder(cfg), 1, 1e-3, "mse", cfg,
                augment=False, accum_steps=2)
    try:
        t.train()
        rows_exist = len(list(jax.tree.leaves(t.state.params))) > 0
        assert rows_exist
    finally:
        t.close()
