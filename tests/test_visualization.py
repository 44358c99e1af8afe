"""Visualization utils: scatter/skeleton drawing (Agg backend)."""

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
