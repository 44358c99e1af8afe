"""Visualization utils: scatter/skeleton drawing (Agg backend)."""

import os
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from single_person_pose_estimation_tpu.utils import visualization


def test_draw_keypoints_scales_and_skips_zeros():
    fig, ax = plt.subplots()
    kps = np.zeros((17, 3), np.float32)
    kps[0] = [32, 32, 0.9]      # center of 64-space
    kps[1] = [16, 48, 0.8]
    visualization.draw_keypoints(ax, kps, image_shape=(256, 256))
    # two scatter collections; positions scaled by 4
    assert len(ax.collections) == 2
    xy = ax.collections[0].get_offsets()[0]
    assert tuple(xy) == (128.0, 128.0)
    plt.close(fig)


def test_draw_skeleton_skips_zero_edges():
    fig, ax = plt.subplots()
    kps = np.zeros((17, 2), np.float32)
    # only left/right shoulder (5, 6) set -> exactly the (5, 6) edge drawn
    kps[5] = [10, 10]
    kps[6] = [20, 10]
    visualization.draw_skeleton(ax, kps, image_shape=(64, 64),
                                heatmap_shape=(64, 64))
    assert len(ax.lines) == 1
    xs, ys = ax.lines[0].get_data()
    assert list(xs) == [10, 20] and list(ys) == [10, 10]
    plt.close(fig)


def test_eval_report_artifacts(tmp_path):
    """utils/reporting writes the markdown + figure artifacts equivalent to
    the reference's published README evaluation screenshots
    (reference README.md:38-43, figures/OKS.PNG + PCK.PNG)."""
    from single_person_pose_estimation_tpu.configs.default_config import (
        COCO_KEYPOINT_LABELS,
    )
    from single_person_pose_estimation_tpu.utils.reporting import (
        eval_report_markdown,
        save_eval_report,
    )

    oks = [0.574, 0.842, 0.654, 0.543, 0.631,
           0.622, 0.852, 0.699, 0.565, 0.707]
    pck = [0.91, 0.89, 0.92, 0.88, 0.88, 0.88, 0.88, 0.86, 0.86,
           0.84, 0.85, 0.75, 0.74, 0.83, 0.83, 0.85, 0.84]

    md = eval_report_markdown(oks, pck, COCO_KEYPOINT_LABELS)
    assert "| AP | 0.50:0.95 | all | 0.574 |" in md
    assert "| nose | 0.91 |" in md
    md_pck_only = eval_report_markdown(None, pck, COCO_KEYPOINT_LABELS)
    assert "OKS" not in md_pck_only and "| nose | 0.91 |" in md_pck_only

    prefix = str(tmp_path / "report")
    paths = save_eval_report(prefix, pck, COCO_KEYPOINT_LABELS,
                             oks_stats=oks)
    assert paths == [prefix + ".md", prefix + "_pck.png",
                     prefix + "_oks.png"]
    for p in paths:
        assert os.path.getsize(p) > 0
    # PNG magic bytes — the figures are real rendered images.
    for p in paths[1:]:
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"

    # Without OKS stats only the markdown + PCK figure are written.
    prefix2 = str(tmp_path / "pck_only")
    paths2 = save_eval_report(prefix2, pck, COCO_KEYPOINT_LABELS)
    assert paths2 == [prefix2 + ".md", prefix2 + "_pck.png"]
