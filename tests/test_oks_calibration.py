"""Calibration of the OKS quality instrument (VERDICT r4 Weak #1 /
Next #1): known-perturbation -> known-AP curves.

The hardware gate used to pass at AP 1.000 on data too easy to
discriminate; a gate at the ceiling cannot detect the class of bug it
exists to catch. These tests make the instrument's transfer function
explicit: inject a controlled keypoint error epsilon into predictions
over a synthetic GT set and assert the measured AP ladder equals the
CLOSED-FORM OKS expectation — per labeled keypoint k the OKS term is
exp(-eps^2 / (2 * area * (2 sigma_k)^2)) (pycocotools computeOks,
mirrored at evaluation/oks.py:45-84), so with one detection per GT at a
uniform displacement the whole 10-rung AP ladder is computable by hand.
A 1-px decode bias and a flip-pair swap are then shown to move AP by
exactly their predicted amounts — the failure modes the gate exists to
catch are detectable and quantified. Mixed-area scenes are additionally
cross-checked against the independent brute-force oracle
(tests/oracle_cocoeval.py).
"""

import numpy as np
import pytest

import oracle_cocoeval
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.evaluation.oks import (
    KPT_OKS_SIGMAS,
    OKS_THRESHOLDS,
    KeypointEval,
    eval_oks,
)

K = 17


def closed_form_oks(eps: float, area: float,
                    vis=None, per_kp_eps=None) -> float:
    """Mean over labeled keypoints of exp(-d_k^2 / (2 s^2 (2 sigma_k)^2))
    with s^2 = gt area — the computeOks formula at a known displacement."""
    d = np.full(K, eps, dtype=np.float64) if per_kp_eps is None \
        else np.asarray(per_kp_eps, dtype=np.float64)
    terms = np.exp(-(d ** 2) / ((2 * KPT_OKS_SIGMAS) ** 2) / (2.0 * area))
    mask = np.ones(K, bool) if vis is None else np.asarray(vis) > 0
    return float(terms[mask].mean())


def expected_ladder_ap(oks_values) -> float:
    """AP over the 10-rung ladder for one same-score detection per GT,
    all with known OKS: at rung t every image with OKS >= t is a TP at
    recall 1 (precision 1 follows once every image matches or ... ) —
    valid only for the uniform case where all images share one OKS."""
    oks_values = np.atleast_1d(oks_values)
    assert np.allclose(oks_values, oks_values[0])
    # Guard: stay off the rung boundaries where float noise flips bins.
    assert np.abs(oks_values[0] - OKS_THRESHOLDS).min() > 1e-6
    return float((oks_values[0] >= OKS_THRESHOLDS).mean())


def make_gt(areas, grid_origin=100.0, spacing=40.0):
    """One person per image; integer keypoint grid; bbox area = areas[i]."""
    images, annotations = [], []
    gt_kps = {}
    for i, a in enumerate(areas):
        side = float(np.sqrt(a))
        kx = np.array([grid_origin + (k % 5) * spacing for k in range(K)])
        ky = np.array([grid_origin + (k // 5) * spacing for k in range(K)])
        gt_kps[i] = (kx, ky)
        kps = []
        for k in range(K):
            kps += [float(kx[k]), float(ky[k]), 2]
        images.append({"id": i, "width": 640, "height": 640})
        annotations.append({
            "id": 1000 + i, "image_id": i, "category_id": 1, "iscrowd": 0,
            "num_keypoints": K, "keypoints": kps, "area": float(a),
            "bbox": [grid_origin, grid_origin, side, side]})
    gt = {"images": images, "annotations": annotations, "categories": []}
    return gt, gt_kps


def detections(gt_kps, dx=0.0, dy=0.0, score=1.0, swap_pairs=None):
    dts = []
    for i, (kx, ky) in gt_kps.items():
        px, py = kx + dx, ky + dy
        if swap_pairs:
            px, py = px.copy(), py.copy()
            for a, b in swap_pairs:
                px[a], px[b] = px[b], px[a]
                py[a], py[b] = py[b], py[a]
        kps = []
        for k in range(K):
            kps += [float(px[k]), float(py[k]), 1]
        dts.append({"image_id": i, "keypoints": kps, "score": score})
    return dts


def test_ap_vs_epsilon_matches_closed_form():
    """The AP-vs-epsilon transfer curve: measured == theory at every
    epsilon, monotone non-increasing, 1.0 at eps=0, 0.0 far out."""
    area = 150.0 ** 2
    gt, gt_kps = make_gt([area] * 6)
    curve_measured, curve_expected = [], []
    for eps in (0.0, 3.0, 6.0, 10.0, 16.0, 26.0, 42.0, 70.0, 300.0):
        dts = detections(gt_kps, dx=eps / np.sqrt(2), dy=eps / np.sqrt(2))
        stats = KeypointEval(gt, dts).evaluate()
        oks = closed_form_oks(eps, area)
        want = expected_ladder_ap([oks] * 6)
        assert stats[0] == pytest.approx(want, abs=1e-9), (eps, oks)
        # AR equals AP here (single detection per GT, same indicator).
        assert stats[5] == pytest.approx(want, abs=1e-9)
        curve_measured.append(stats[0])
        curve_expected.append(want)
    assert curve_measured[0] == 1.0
    assert curve_measured[-1] == 0.0
    assert all(a >= b - 1e-12 for a, b in
               zip(curve_measured, curve_measured[1:]))
    # The ladder actually discriminates: the curve passes through
    # mid-range values, not just the endpoints.
    assert any(0.05 < v < 0.95 for v in curve_measured)
    np.testing.assert_allclose(curve_measured, curve_expected, atol=1e-9)


def test_one_px_decode_bias_moves_ap_by_predicted_amount():
    """A +1px systematic bias (the decode-v2 class of bug) must move AP
    off the ceiling by exactly the closed-form amount at small scales."""
    area = 20.0 ** 2   # small person: 1px is a real OKS hit
    gt, gt_kps = make_gt([area] * 4)
    base = KeypointEval(gt, detections(gt_kps)).evaluate()
    assert base[0] == 1.0
    biased = KeypointEval(gt, detections(gt_kps, dx=1.0)).evaluate()
    oks = closed_form_oks(1.0, area)
    want = expected_ladder_ap([oks] * 4)
    assert biased[0] == pytest.approx(want, abs=1e-9)
    assert biased[0] < 1.0, "1px bias must be visible at small scale"
    # Predicted delta, asserted: the instrument's sensitivity is known.
    assert base[0] - biased[0] == pytest.approx(1.0 - want, abs=1e-9)


def test_flip_pair_swap_detected_with_predicted_ap():
    """Swapping left/right predictions (a broken flip-pair table) moves
    each paired keypoint by its pair separation; the 5 unpaired
    keypoints stay exact. AP must equal the closed-form value for that
    per-keypoint displacement — and it is FAR from the ceiling."""
    flip_pairs = Config().flip_pairs
    area = 150.0 ** 2
    gt, gt_kps = make_gt([area] * 4)
    dts = detections(gt_kps, swap_pairs=flip_pairs)
    stats = KeypointEval(gt, dts).evaluate()

    kx, ky = gt_kps[0]
    per_kp = np.zeros(K)
    for a, b in flip_pairs:
        d = float(np.hypot(kx[a] - kx[b], ky[a] - ky[b]))
        per_kp[a] = per_kp[b] = d
    oks = closed_form_oks(0.0, area, per_kp_eps=per_kp)
    want = expected_ladder_ap([oks] * 4)
    assert stats[0] == pytest.approx(want, abs=1e-9)
    assert stats[0] <= 0.5, f"swap must crater AP, got {stats[0]}"


def test_mixed_area_epsilon_sweep_matches_bruteforce_oracle():
    """Scale spread: the same epsilon is benign for large people and
    fatal for small ones — per-image OKS differs, so the PR accumulation
    does real work. Cross-checked against the independent brute-force
    oracle rather than closed form."""
    areas = [16.0 ** 2, 40.0 ** 2, 80.0 ** 2, 160.0 ** 2, 320.0 ** 2]
    gt, gt_kps = make_gt(areas)
    for eps in (2.0, 8.0, 30.0):
        dts = [dict(d, score=1.0 - 0.01 * i)
               for i, d in enumerate(detections(gt_kps, dx=eps))]
        stats = KeypointEval(gt, dts).evaluate()
        oracle = oracle_cocoeval.evaluate(
            gt["annotations"], dts, sorted(gt_kps))
        np.testing.assert_allclose(stats, oracle, atol=1e-9,
                                   err_msg=f"eps={eps}")
        # Mid-band by construction at eps=8: some scales pass, some fail.
        if eps == 8.0:
            assert 0.05 < stats[0] < 0.95
    # Degenerate sanity: per-image OKS ordering respected — tiny person
    # fails first.
    oks_small = closed_form_oks(8.0, areas[0])
    oks_large = closed_form_oks(8.0, areas[-1])
    assert oks_small < 0.5 < oks_large


def test_eval_oks_entrypoint_curve(tmp_path):
    """The same transfer function through the production eval_oks entry
    point (predict_ds record format, int-cast coords — integer epsilon
    keeps the cast exact), against a GT file on disk."""
    import json

    area = 60.0 ** 2
    gt, gt_kps = make_gt([area] * 3)
    gt_path = str(tmp_path / "gt.json")
    with open(gt_path, "w") as f:
        json.dump(gt, f)
    for eps, expect_top in ((0, True), (6, False)):
        preds = []
        for i, (kx, ky) in gt_kps.items():
            preds.append({
                "image_id": i, "ann_id": 1000 + i,
                "xs/pred": [float(v + eps) for v in kx],
                "ys/pred": [float(v) for v in ky],
                "confs": [0.9] * K,
            })
        stats = eval_oks(preds, gt_path, verbose=False)
        oks = closed_form_oks(eps, area)
        want = expected_ladder_ap([oks] * 3)
        assert stats[0] == pytest.approx(want, abs=1e-9)
        assert (stats[0] == 1.0) == expect_top
