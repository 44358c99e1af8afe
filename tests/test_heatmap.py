"""Golden tests for Gaussian heatmap rendering.

The oracle below is an independent numpy re-derivation of the reference
semantics (dataset_builder.py:220-238 + data_utils.py:187-211): truncate
coords to int, render only if 0 < x < W and 0 < y < H and v > 0, stamp the
unnormalized Gaussian on the clipped +-3*sigma window, peak-normalize.
"""

import numpy as np
import pytest

from single_person_pose_estimation_tpu.ops.heatmap import (
    render_heatmaps,
    render_heatmaps_batch,
)


def numpy_oracle(kps_x, kps_y, kps_v, H=64, W=64, sigma=1.0):
    K = len(kps_x)
    out = np.zeros((H, W, K), dtype=np.float32)
    radius = int(3 * sigma)
    for i in range(K):
        x = int(kps_x[i])
        y = int(kps_y[i])
        if not (0 < x < W and 0 < y < H and kps_v[i] > 0):
            continue
        for yy in range(max(0, y - radius), min(H, y + radius + 1)):
            for xx in range(max(0, x - radius), min(W, x + radius + 1)):
                out[yy, xx, i] = np.exp(
                    -((xx - x) ** 2 + (yy - y) ** 2) / (2 * sigma**2))
        out[:, :, i] /= out[:, :, i].max()
    return out


def test_matches_numpy_oracle_random():
    rng = np.random.default_rng(0)
    kx = rng.uniform(-5, 70, size=17).astype(np.float32)
    ky = rng.uniform(-5, 70, size=17).astype(np.float32)
    kv = rng.integers(0, 3, size=17)
    got = np.asarray(render_heatmaps(kx, ky, kv))
    want = numpy_oracle(kx, ky, kv)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_peak_value_is_one():
    got = np.asarray(render_heatmaps(
        np.array([10.0]), np.array([20.0]), np.array([2])))
    assert got[20, 10, 0] == 1.0
    assert got.max() == 1.0


def test_window_is_seven_wide():
    got = np.asarray(render_heatmaps(
        np.array([10.0]), np.array([20.0]), np.array([2])))
    assert got[20, 13, 0] > 0          # x offset +3: inside window
    assert got[20, 14, 0] == 0.0       # x offset +4: outside window
    assert got[17, 10, 0] > 0
    assert got[16, 10, 0] == 0.0


def test_zero_coordinate_excluded():
    # Reference condition is strict: 0 < x, so x == 0 renders nothing.
    got = np.asarray(render_heatmaps(
        np.array([0.0, 63.0]), np.array([5.0, 63.0]), np.array([2, 2])))
    assert got[:, :, 0].max() == 0.0
    assert got[:, :, 1].max() == 1.0   # x = 63 < 64 is valid


def test_truncation_matches_int_cast():
    # int(63.9) = 63 (valid); int(-0.5) = 0 (invalid).
    got = np.asarray(render_heatmaps(
        np.array([63.9, -0.5]), np.array([10.2, 10.0]), np.array([1, 1])))
    assert got[10, 63, 0] == 1.0
    assert got[:, :, 1].max() == 0.0


def test_invisible_keypoint_renders_nothing():
    got = np.asarray(render_heatmaps(
        np.array([10.0]), np.array([10.0]), np.array([0])))
    assert got.max() == 0.0


def test_border_window_clipping():
    got = np.asarray(render_heatmaps(
        np.array([1.0]), np.array([1.0]), np.array([2])))
    want = numpy_oracle(np.array([1.0]), np.array([1.0]), np.array([2]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    kx = rng.uniform(0, 64, size=(4, 17)).astype(np.float32)
    ky = rng.uniform(0, 64, size=(4, 17)).astype(np.float32)
    kv = rng.integers(0, 3, size=(4, 17))
    batched = np.asarray(render_heatmaps_batch(kx, ky, kv))
    for b in range(4):
        single = np.asarray(render_heatmaps(kx[b], ky[b], kv[b]))
        np.testing.assert_array_equal(batched[b], single)


@pytest.mark.parametrize("sigma", [1.0, 2.0])
def test_sigma_generalizes(sigma):
    kx = np.array([32.0])
    ky = np.array([32.0])
    kv = np.array([2])
    got = np.asarray(render_heatmaps(kx, ky, kv, sigma=sigma))
    want = numpy_oracle(kx, ky, kv, sigma=sigma)
    np.testing.assert_allclose(got, want, atol=1e-5)
