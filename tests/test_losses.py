"""Tests for heatmap losses, including golden checks against hand-computed
values and the Keras multi-output reduction semantics."""

import numpy as np
import pytest

from single_person_pose_estimation_tpu import losses


def rand(shape, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, size=shape).astype(np.float32)


def test_mse_matches_numpy():
    yt, yp = rand((2, 4, 4, 3), 0), rand((2, 4, 4, 3), 1)
    got = np.asarray(losses.mse(yt, yp))
    want = np.mean((yt - yp) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape == (2, 4, 4)


def test_weighted_mse_weights():
    yt = np.zeros((1, 2, 2, 2), dtype=np.float32)
    yt[0, 0, 0, 0] = 0.5
    yp = np.zeros_like(yt)
    yp[0, 0, 0, 0] = 0.25
    yp[0, 1, 1, 1] = 0.1
    got = np.asarray(losses.weighted_mse(yt, yp))
    # positive pixel: weight 82; background: weight 1; mean over K axis
    assert got[0, 0, 0] == pytest.approx((82 * 0.25**2 + 0.0) / 2)
    assert got[0, 1, 1] == pytest.approx((0.0 + 1 * 0.1**2) / 2)


def test_iou_perfect_prediction_near_zero():
    yt = rand((2, 8, 8, 3), 2)
    got = np.asarray(losses.iou(yt, yt))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_iou_disjoint_prediction_near_one():
    yt = np.zeros((1, 4, 4, 1), dtype=np.float32)
    yt[0, 0, 0, 0] = 1.0
    yp = np.zeros_like(yt)
    yp[0, 3, 3, 0] = 1.0
    got = np.asarray(losses.iou(yt, yp))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_iou_hand_computed():
    yt = np.zeros((1, 2, 2, 1), dtype=np.float32)
    yt[0, 0, 0, 0] = 1.0
    yp = np.full_like(yt, 0.5)
    inter = 0.5
    union = 1.0 + 4 * 0.25 - 0.5
    eps = 1e-7
    want = 1 - (inter + eps) / (union + eps)
    got = np.asarray(losses.iou(yt, yp))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_keypoint_mse_masks_empty_channels():
    yt = np.zeros((1, 4, 4, 2), dtype=np.float32)
    yt[0, 1, 1, 0] = 1.0          # channel 0 has a blob; channel 1 empty
    yp = np.ones_like(yt) * 0.5
    got = np.asarray(losses.weighted_keypoint_mse(yt, yp))
    # channel 1 contributes 0 despite the prediction error
    manual = ((yt[..., 0] - 0.5) ** 2 * 1.0 + 0.0) / 2
    np.testing.assert_allclose(got[0], manual[0], rtol=1e-6)


def test_total_loss_sums_stacks():
    yt = rand((2, 8, 8, 3), 3)
    outs = [rand((2, 8, 8, 3), s) for s in (4, 5)]
    per = [float(np.mean(np.asarray(losses.mse(yt, o)))) for o in outs]
    got = float(losses.total_loss(losses.mse, yt, outs))
    assert got == pytest.approx(sum(per), rel=1e-6)


def test_registry_dispatch():
    assert losses.get_loss_from_string("IOU") is losses.iou
    assert losses.get_loss_from_string("mse") is losses.mse
    assert losses.get_loss_from_string("weighted_mse") is losses.weighted_mse
    assert (losses.get_loss_from_string("weighted_keypoint_mse")
            is losses.weighted_keypoint_mse)
    with pytest.raises(ValueError):
        losses.get_loss_from_string("nope")


def test_losses_match_tf_reference_formulas():
    """Cross-check against TensorFlow implementations of the reference's
    exact formulas (loss.py:2-36). Skipped when TF is unavailable."""
    tf = pytest.importorskip("tensorflow")
    yt, yp = rand((2, 8, 8, 5), 6), rand((2, 8, 8, 5), 7)

    w = tf.cast(tf.constant(yt) > 0, tf.float32) * 81 + 1
    tf_wmse = tf.reduce_mean(tf.square(yt - yp) * w, axis=-1).numpy()
    np.testing.assert_allclose(np.asarray(losses.weighted_mse(yt, yp)),
                               tf_wmse, rtol=1e-5)

    eps = tf.keras.backend.epsilon()
    inter = tf.reduce_sum(yt * yp, axis=[1, 2])
    union = (tf.reduce_sum(yt * yt, axis=[1, 2])
             + tf.reduce_sum(yp * yp, axis=[1, 2]) - inter)
    tf_iou = (1 - tf.reduce_mean((inter + eps) / (union + eps), axis=-1)).numpy()
    np.testing.assert_allclose(np.asarray(losses.iou(yt, yp)), tf_iou, rtol=1e-5)

    hs = tf.reduce_sum(yt, axis=[1, 2], keepdims=True)
    kw = 1.0 - tf.cast(tf.equal(hs, 0.0), tf.float32)
    tf_wkmse = tf.reduce_mean(tf.square(yt - yp) * kw, axis=-1).numpy()
    np.testing.assert_allclose(np.asarray(losses.weighted_keypoint_mse(yt, yp)),
                               tf_wkmse, rtol=1e-5)
