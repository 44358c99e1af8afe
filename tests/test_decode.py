"""Golden tests for heatmap -> keypoint decoding.

The numpy oracles re-derive the reference behavior (data_utils.py:100-183)
independently, *including* the v2 quirks: the always-non-negative quarter
pixel offset and the hardcoded %3 patch decode at map borders.
"""

import numpy as np

from single_person_pose_estimation_tpu.ops.decode import (
    decode_batch,
    decode_v1,
    decode_v1_batch,
    decode_v2_corrected,
    decode_v2_legacy,
)


def oracle_v1(heatmaps, conf_threshold=1e-6):
    H, W, K = heatmaps.shape
    out = np.zeros((K, 3), dtype=np.float32)
    for i in range(K):
        hm = heatmaps[:, :, i]
        idx = np.argmax(hm)
        x = idx % W
        y = idx // H  # reference divides by height
        conf = hm[y, x]
        if conf > conf_threshold:
            out[i] = [x, y, conf]
    return out


def oracle_v2_legacy(heatmaps, conf_threshold=1e-6):
    H, W, K = heatmaps.shape
    out = np.zeros((K, 3), dtype=np.float32)
    for i in range(K):
        hm = heatmaps[:, :, i].copy()
        idx = np.argmax(hm)
        x = idx % W
        y = idx // H
        conf = hm[y, x]
        x1, x2 = max(x - 1, 0), min(x + 2, W)
        y1, y2 = max(y - 1, 0), min(y + 2, H)
        patch = hm[y1:y2, x1:x2].copy()
        patch[1][1] = 0
        pidx = np.argmax(patch)
        px = pidx % 3
        py = pidx // 3
        if conf > conf_threshold:
            out[i] = [x + px / 4, y + py / 4, conf]
    return out


def random_heatmaps(seed, H=64, W=64, K=17, border_peaks=False):
    rng = np.random.default_rng(seed)
    hm = rng.uniform(0, 1, size=(H, W, K)).astype(np.float32) * 0.3
    for i in range(K):
        if border_peaks:
            x = rng.choice([0, 1, W - 2, W - 1])
            y = rng.choice([0, 1, H - 2, H - 1])
        else:
            x = rng.integers(0, W)
            y = rng.integers(0, H)
        hm[y, x, i] = rng.uniform(0.5, 1.0)
    return hm


def test_v1_matches_oracle():
    hm = random_heatmaps(0)
    np.testing.assert_allclose(np.asarray(decode_v1(hm)), oracle_v1(hm), rtol=1e-6)


def test_v1_threshold_zeroes():
    hm = np.full((64, 64, 17), 0.05, dtype=np.float32)
    got = np.asarray(decode_v1(hm, conf_threshold=0.1))
    assert (got == 0).all()


def test_v2_legacy_matches_oracle_interior():
    for seed in range(5):
        hm = random_heatmaps(seed)
        got = np.asarray(decode_v2_legacy(hm))
        want = oracle_v2_legacy(hm)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_v2_legacy_matches_oracle_borders():
    """Border peaks trigger the reference's clipped-patch mis-indexing;
    the legacy decode must reproduce it bug-for-bug."""
    for seed in range(10):
        hm = random_heatmaps(seed, border_peaks=True)
        got = np.asarray(decode_v2_legacy(hm))
        want = oracle_v2_legacy(hm)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_v2_legacy_offset_never_negative():
    hm = random_heatmaps(3)
    got = np.asarray(decode_v2_legacy(hm))
    base = np.asarray(decode_v1(hm))
    assert (got[:, 0] >= base[:, 0]).all()
    assert (got[:, 1] >= base[:, 1]).all()


def test_v2_corrected_signed_offset():
    hm = np.zeros((64, 64, 1), dtype=np.float32)
    hm[30, 30, 0] = 1.0
    hm[30, 29, 0] = 0.8   # strongest neighbor is to the LEFT
    got = np.asarray(decode_v2_corrected(hm))
    assert got[0, 0] == 30 - 0.25
    assert got[0, 1] == 30


def test_v2_corrected_offsets_bounded():
    hm = random_heatmaps(7)
    got = np.asarray(decode_v2_corrected(hm))
    base = np.asarray(decode_v1(hm))
    keep = base[:, 2] > 0
    assert (np.abs(got[keep, 0] - base[keep, 0]) <= 0.25 + 1e-6).all()
    assert (np.abs(got[keep, 1] - base[keep, 1]) <= 0.25 + 1e-6).all()


def test_batched_matches_single():
    hms = np.stack([random_heatmaps(s) for s in range(3)])
    got = np.asarray(decode_batch(hms, legacy=True))
    for b in range(3):
        single = np.asarray(decode_v2_legacy(hms[b]))
        np.testing.assert_array_equal(got[b], single)
    got1 = np.asarray(decode_v1_batch(hms))
    for b in range(3):
        np.testing.assert_array_equal(got1[b], np.asarray(decode_v1(hms[b])))


def test_tie_breaking_matches_numpy_first_max():
    hm = np.zeros((64, 64, 1), dtype=np.float32)
    hm[10, 10, 0] = 0.9
    hm[10, 11, 0] = 0.7   # two tied runner-ups in the patch
    hm[11, 10, 0] = 0.7
    got = np.asarray(decode_v2_legacy(hm))
    want = oracle_v2_legacy(hm)
    np.testing.assert_allclose(got, want, rtol=1e-6)
