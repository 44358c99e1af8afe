"""Tests for bbox/crop geometry ops."""

import numpy as np
import pytest

from single_person_pose_estimation_tpu.ops import geometry


def test_transform_bbox_square_wide_box():
    # w > h: side = w * scale, same center (data_utils.py:16-45)
    x, y, w, h = geometry.transform_bbox_square((10.0, 20.0, 40.0, 20.0), 1.0)
    assert (x, y, w, h) == (10.0, 10.0, 40.0, 40.0)


def test_transform_bbox_square_tall_box_scaled():
    x, y, w, h = geometry.transform_bbox_square((0.0, 0.0, 10.0, 40.0), 1.25)
    assert w == h == 50.0
    assert x == pytest.approx(5 - 25)      # center_x 5, half-side 25
    assert y == pytest.approx(20 - 25)


def test_transform_bbox_square_batched():
    boxes = np.array([[10.0, 20.0, 40.0, 20.0], [0.0, 0.0, 10.0, 40.0]])
    out = np.asarray(geometry.transform_bbox_square(boxes, 1.0))
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0], [10, 10, 40, 40])
    np.testing.assert_allclose(out[1], [-15, 0, 40, 40])


def test_keypoints_to_crop_frame():
    # Replicates gen_tfrecords.py:44-54 filtering.
    xs = np.array([50.0, 5.0, 150.0, 60.0])
    ys = np.array([50.0, 5.0, 150.0, 60.0])
    vs = np.array([2, 2, 2, 0])
    bbox = np.array([40.0, 40.0, 50.0, 50.0])
    ox, oy, ov = geometry.keypoints_to_crop_frame(xs, ys, vs, bbox)
    ox, oy, ov = np.asarray(ox), np.asarray(oy), np.asarray(ov)
    np.testing.assert_allclose(ox, [10.0, 0.0, 0.0, 0.0])  # others filtered
    np.testing.assert_allclose(oy, [10.0, 0.0, 0.0, 0.0])
    np.testing.assert_array_equal(ov, [2, 0, 0, 0])


def test_keypoint_on_boundary_filtered():
    # Strict inequalities: x - bx == 0 and == w are both dropped.
    xs = np.array([40.0, 90.0])
    ys = np.array([50.0, 50.0])
    vs = np.array([2, 2])
    bbox = np.array([40.0, 40.0, 50.0, 50.0])
    _, _, ov = geometry.keypoints_to_crop_frame(xs, ys, vs, bbox)
    assert np.asarray(ov).tolist() == [0, 0]


def test_crop_and_resize_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    out = np.asarray(geometry.crop_and_resize(
        img, np.array([0.0, 0.0, 64.0, 64.0]), 64, 64))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_crop_and_resize_zero_pad_outside():
    img = np.ones((32, 32, 3), dtype=np.float32)
    # Box fully left of the image -> all zeros.
    out = np.asarray(geometry.crop_and_resize(
        img, np.array([-100.0, 0.0, 32.0, 32.0]), 16, 16))
    assert out.max() == 0.0
    # Box half outside: roughly half the mass.
    out = np.asarray(geometry.crop_and_resize(
        img, np.array([-16.0, 0.0, 32.0, 32.0]), 32, 32))
    assert 0.4 < out.mean() < 0.6


def test_crop_and_resize_matches_tf_crop_resize():
    """Parity with the reference pipeline: crop_and_pad + tf.image.resize
    (demo.py:51-53). Interior boxes, integer coords."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(100, 120, 3)).astype(np.float32)
    box = (20.0, 10.0, 60.0, 60.0)
    crop = img[10:70, 20:80]
    want = tf.image.resize(crop, (256, 256)).numpy()
    got = np.asarray(geometry.crop_and_resize(img, np.array(box), 256, 256))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_undo_bbox():
    xs = np.array([0.5, 0.25])
    ys = np.array([0.5, 0.75])
    ux, uy = geometry.undo_bbox(10.0, 20.0, 100.0, 200.0, xs, ys)
    np.testing.assert_allclose(np.asarray(ux), [60.0, 35.0])
    np.testing.assert_allclose(np.asarray(uy), [120.0, 170.0])
