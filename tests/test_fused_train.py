"""fused_train_apply (models/fused_train.py) vs model.apply(train=True):
outputs, updated running statistics, and parameter gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu import losses
from single_person_pose_estimation_tpu.experimental.fused_train import (
    fused_train_apply,
)
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

NUM_STACKS = 2


@pytest.fixture(scope="module")
def setup():
    model = StackedHourglass(num_stacks=NUM_STACKS, num_channels=16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    targets = jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 16, 17))
    return model, variables, images, targets


def test_outputs_and_stats_match_flax(setup):
    model, variables, images, _ = setup
    outs, stats = fused_train_apply(variables, images,
                                    num_stacks=NUM_STACKS,
                                    compute_dtype=jnp.float32)
    want_outs, mut = jax.jit(
        lambda v, x: model.apply(v, x, train=True,
                                 mutable=["batch_stats"]))(variables, images)
    assert len(outs) == NUM_STACKS
    for got, want in zip(outs, want_outs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
    want_stats = mut["batch_stats"]
    assert set(stats) == set(want_stats)
    for name in want_stats:
        for field in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(stats[name][field]),
                np.asarray(want_stats[name][field]),
                atol=1e-5, rtol=1e-4, err_msg=f"{name}/{field}")


def test_grads_match_flax_autodiff(setup):
    model, variables, images, targets = setup

    def fused_loss(params):
        outs, _ = fused_train_apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, num_stacks=NUM_STACKS, compute_dtype=jnp.float32)
        return losses.total_loss(losses.iou, targets, outs)

    def flax_loss(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=True, mutable=["batch_stats"])
        return losses.total_loss(losses.iou, targets, outs)

    lf, gf = jax.jit(jax.value_and_grad(fused_loss))(variables["params"])
    lx, gx = jax.jit(jax.value_and_grad(flax_loss))(variables["params"])
    assert float(lf) == pytest.approx(float(lx), abs=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    assert len(flat_f) == len(flat_x)
    global_scale = max(float(np.abs(np.asarray(l)).max())
                       for l in jax.tree.leaves(gx))
    for path, leaf in flat_f:
        want = flat_x[path]
        # Per-leaf scale floored by 1e-3 of the global grad scale: a few
        # leaves (e.g. conv biases whose constant shift the following BN
        # removes at near-100% ReLU activity) have true grads ~0, where
        # pure per-leaf normalization amplifies f32 reduction noise into
        # false alarms. Real math errors (wrong shift/sign) are O(1) on
        # normally-scaled leaves and still trip this.
        scale = max(float(np.abs(np.asarray(want)).max()),
                    1e-3 * global_scale)
        np.testing.assert_allclose(
            np.asarray(leaf) / scale, np.asarray(want) / scale,
            atol=2e-4, err_msg=jax.tree_util.keystr(path))


def test_train_step_fused_backend_matches_flax(setup):
    """One full optimizer step through steps.make_train_step with
    model_backend='fused' lands on the same params/stats as 'flax'."""
    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )
    from single_person_pose_estimation_tpu.training import steps

    model, _, images, _ = setup
    cfg = Config()
    tx = steps.make_optimizer(1e-3)
    B = images.shape[0]
    batch = {
        "image": jax.image.resize(images, (B, 256, 256, 3), "bilinear"),
        "kx": jnp.full((B, 17), 20.0),
        "ky": jnp.full((B, 17), 30.0),
        "kv": jnp.full((B, 17), 2, jnp.int32),
    }
    results = {}
    for backend in ("flax", "fused"):
        state = steps.TrainState.create(model, tx, jax.random.PRNGKey(7))
        step = steps.make_train_step(model, tx, losses.iou, cfg,
                                     augment=False, model_backend=backend)
        state, metrics = step(state, batch)
        results[backend] = (state, float(metrics["loss"]))
    assert results["fused"][1] == pytest.approx(results["flax"][1],
                                                abs=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(results["fused"][0].params)
    flat_x = dict(
        jax.tree_util.tree_leaves_with_path(results["flax"][0].params))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]), atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fused_backend_rejects_mobile():
    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )
    from single_person_pose_estimation_tpu.training import steps

    model = StackedHourglass(num_stacks=1, num_channels=16, mobile=True)
    with pytest.raises(ValueError, match="non-mobile"):
        steps.make_train_step(model, steps.make_optimizer(1e-3),
                              losses.iou, Config(), model_backend="fused")


def test_bf16_outputs_close(setup):
    model, variables, images, _ = setup
    bf16_model = model.clone(compute_dtype=jnp.bfloat16)
    outs, _ = fused_train_apply(variables, images, num_stacks=NUM_STACKS,
                                compute_dtype=jnp.bfloat16)
    want, _ = jax.jit(
        lambda v, x: bf16_model.apply(v, x, train=True,
                                      mutable=["batch_stats"]))(variables,
                                                                images)
    for got, w in zip(outs, want):
        assert np.abs(np.asarray(got) - np.asarray(w)).max() < 0.05


def test_fused_backend_under_dp_mesh(setup):
    """model_backend='fused' composed with the GSPMD data-parallel mesh:
    one sharded step must match the single-device fused step.

    SGD, not Adam: Adam's m-hat/sqrt(v-hat) amplifies f32
    reduction-order noise (~1e-7) in near-zero gradients into +-lr
    param deltas (same rationale as
    test_parallel.test_data_parallel_matches_single_device)."""
    import optax
    from jax.sharding import Mesh

    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )
    from single_person_pose_estimation_tpu.training import steps

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model, _, images, _ = setup
    cfg = Config()
    tx = optax.sgd(0.01)
    B = 8
    batch = {
        "image": jax.image.resize(
            jnp.tile(images, (2, 1, 1, 1)), (B, 256, 256, 3), "bilinear"),
        "kx": jnp.full((B, 17), 20.0),
        "ky": jnp.full((B, 17), 30.0),
        "kv": jnp.full((B, 17), 2, jnp.int32),
    }
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    results = {}
    for tag, kwargs in (("single", {}), ("mesh", {"mesh": mesh})):
        state = steps.TrainState.create(model, tx, jax.random.PRNGKey(3))
        step = steps.make_train_step(model, tx, losses.iou, cfg,
                                     augment=False, model_backend="fused",
                                     **kwargs)
        state, metrics = step(state, batch)
        results[tag] = (state, float(metrics["loss"]))
    assert results["mesh"][1] == pytest.approx(results["single"][1],
                                               abs=1e-5)
    flat_m = jax.tree_util.tree_leaves_with_path(results["mesh"][0].params)
    flat_s = dict(
        jax.tree_util.tree_leaves_with_path(results["single"][0].params))
    for path, leaf in flat_m:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), atol=5e-4,
            err_msg=jax.tree_util.keystr(path))
