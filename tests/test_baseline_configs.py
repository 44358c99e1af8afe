"""The five benchmark configurations from BASELINE.json, exercised
directly (the other three are covered in depth by test_parallel/test_eval/
test_demo; cross-referenced here)."""

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu import losses
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.ops.decode import decode_v1, decode_v2
from single_person_pose_estimation_tpu.training import steps as steps_lib


def test_config1_single_image_256_forward_and_decode():
    """1-stack hourglass, single 256x256 image forward + argmax decode."""
    model = StackedHourglass(num_stacks=1, num_channels=256)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
                   train=False)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    hms = model.apply(v, img, train=False)[-1]
    assert hms.shape == (1, 64, 64, 17)
    kps = decode_v1(hms[0], conf_threshold=1e-6)
    assert kps.shape == (17, 3)
    assert (np.asarray(kps[:, 2]) > 0).all()     # sigmoid head -> conf > 0
    kps2 = decode_v2(hms[0], conf_threshold=1e-6, legacy=True)
    assert kps2.shape == (17, 3)


def test_config2_two_stack_mse_training_step():
    """2-stack batch-8 MSE step with intermediate supervision: covered in
    depth by test_parallel.test_loss_decreases_over_steps; assert the
    metric structure here."""
    cfg = Config().replace(hg_num_stacks=2, hg_num_channels=16,
                           image_height=64, image_width=64,
                           label_height=16, label_width=16)
    model = StackedHourglass(num_stacks=2, num_channels=16)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                        input_shape=(1, 64, 64, 3))
    step = steps_lib.make_train_step(model, tx, losses.mse, cfg)
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3)),
        "kx": jax.random.uniform(jax.random.PRNGKey(2), (8, 17)) * 16,
        "ky": jax.random.uniform(jax.random.PRNGKey(3), (8, 17)) * 16,
        "kv": jnp.full((8, 17), 2, jnp.int32),
    }
    state, metrics = step(state, batch)
    assert "loss/hg0" in metrics and "loss/hg1" in metrics


def test_config3_eight_stack_paper_config_with_pipeline():
    """8-stack (paper config) end-to-end: record pipeline -> full on-device
    augmentation -> weighted-MSE and IoU train steps."""
    import tempfile

    from single_person_pose_estimation_tpu.data import coco, pipeline
    from test_data import make_synthetic_coco

    with tempfile.TemporaryDirectory() as td:
        root = f"{td}/dataset"
        make_synthetic_coco(root, "train2017", n_images=2, people_per=2)
        make_synthetic_coco(root, "val2017", n_images=1, people_per=1)
        cfg = Config().replace(
            dataset_dir=root, batch_size=2, num_examples_per_record=4,
            hg_num_stacks=8, hg_num_channels=8,
            image_height=64, image_width=64,
            label_height=16, label_width=16)
        coco.gen_trainval_records(cfg)
        builder = pipeline.DatasetBuilder(cfg)
        train_it, _ = builder.build_datasets()

        model = StackedHourglass(num_stacks=8, num_channels=8)
        tx = steps_lib.make_optimizer(1e-3)
        state = steps_lib.TrainState.create(
            model, tx, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

        for loss_name in ("weighted_mse", "iou"):
            step = steps_lib.make_train_step(
                model, tx, losses.get_loss_from_string(loss_name), cfg,
                augment=True)
            state, metrics = step(state, next(train_it))
            assert np.isfinite(float(metrics["loss"]))
            # 8 intermediate-supervision heads, each contributing.
            assert sum(1 for k in metrics if k.startswith("loss/hg")) == 8


def test_eight_stack_param_scaling():
    """8 stacks at 256ch: front + 8 modules; each non-final module adds the
    two next-stage head convs the final one lacks."""
    m8 = StackedHourglass(num_stacks=8, num_channels=256)
    v8 = jax.eval_shape(lambda: m8.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)),
                                        train=False))
    n8 = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v8))
    m4 = StackedHourglass(num_stacks=4, num_channels=256)
    v4 = jax.eval_shape(lambda: m4.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)),
                                        train=False))
    n4 = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v4))
    per_module_with_heads = 3_374_865       # hourglass module + both heads
    assert n8 - n4 == 4 * per_module_with_heads
    assert n8 == 27_283_720


# Config 4 (batched eval pipeline -> OKS/PCK): tests/test_eval.py.
# Config 5 (two-stage demo on images/video): tests/test_demo.py.
