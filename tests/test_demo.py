"""Demo tests: two-stage detect with a stub person detector, crop/keypoint
geometry, rendering paths, webcam codec helpers."""

import os

import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np
import pytest

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.demo.demo import Demo
from single_person_pose_estimation_tpu.demo import webcam
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.training import steps as steps_lib


CFG = Config().replace(image_height=64, image_width=64,
                       label_height=16, label_width=16,
                       hg_num_stacks=1, hg_num_channels=16)


@pytest.fixture(scope="module")
def demo():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                        input_shape=(1, 64, 64, 3))

    def detector(image):
        # Stub stage 1: two fixed person boxes + one below threshold.
        return [(10.0, 10.0, 40.0, 80.0, 0.9),
                (60.0, 20.0, 50.0, 60.0, 0.8),
                (0.0, 0.0, 5.0, 5.0, 1e-9)]

    return Demo(detector, model, state, CFG, max_num_ppl=4,
                person_conf_thres=1e-6)


def test_detect_populates_results(demo):
    image = (np.random.default_rng(0).uniform(0, 255, (120, 160, 3))
             ).astype(np.uint8)
    demo.detect(image)
    assert len(demo.original_bboxes) == 2        # sub-threshold box dropped
    assert len(demo.square_bboxes) == 2
    assert len(demo.cropped_images) == 2
    assert len(demo.keypoints_list) == 2
    assert demo.cropped_images[0].shape == (64, 64, 3)
    kps = demo.keypoints_list[0]
    assert kps.shape == (17, 3)
    # crop-normalized coordinates
    assert (kps[:, 0] >= 0).all() and (kps[:, 0] <= 1.0).all()


def test_square_bbox_expansion(demo):
    image = np.zeros((120, 160, 3), np.uint8)
    demo.detect(image)
    x, y, w, h = demo.square_bboxes[0]
    assert w == h == pytest.approx(80 * 1.25)    # longer side x BBOX_SCALE
    # same center as original (10,10,40,80)
    assert x + w / 2 == pytest.approx(10 + 20)
    assert y + h / 2 == pytest.approx(10 + 40)


def test_max_num_ppl_truncation():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                        input_shape=(1, 64, 64, 3))
    many = [(5.0 * i, 5.0, 20.0, 30.0, 0.9) for i in range(10)]
    d = Demo(lambda im: many, model, state, CFG, max_num_ppl=3)
    d.detect(np.zeros((100, 100, 3), np.uint8))
    assert len(d.original_bboxes) == 3


def test_no_person_detected():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                        input_shape=(1, 64, 64, 3))
    d = Demo(lambda im: [], model, state, CFG)
    d.detect(np.zeros((100, 100, 3), np.uint8))
    assert d.keypoints_list == []
    assert d.create_overlay().shape == (100, 100, 4)


def test_crop_content_matches_box(demo):
    """Crop pixels must come from inside the (clipped) square box."""
    image = np.zeros((120, 160, 3), np.uint8)
    image[10:90, 10:50] = 200   # fill the first person's box area
    demo.detect(image)
    crop = demo.cropped_images[0]
    assert crop.mean() > 0.05   # got actual content
    assert crop.max() <= 200 / 255.0 + 1e-5


def test_rendering_paths(demo):
    image = np.random.default_rng(1).uniform(
        0, 255, (120, 160, 3)).astype(np.uint8)
    demo.detect(image)
    demo.show(figsize=(4, 4), show_bboxes=True)
    demo.show_bboxes(figsize=(4, 4), show_square_bboxes=True)
    demo.show_separate(figsize=(4, 4))
    overlay = demo.create_overlay()
    assert overlay.shape == (120, 160, 4)
    assert overlay.dtype == np.uint8


def test_overlay_alpha_masks_background(demo):
    image = np.zeros((80, 80, 3), np.uint8)
    demo.detect(image)
    overlay = demo.create_overlay()
    # transparent where nothing drawn
    assert (overlay[:, :, 3] == 0).any()


YOLO_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "yolov5_xyxy.npz")


def test_yolov5_adapter_tensor_api():
    """yolov5_adapter against a recorded results.xyxy[0]-format tensor
    (VERDICT.md Missing #4): person-class filter, strict > threshold,
    xyxy -> xywh conversion."""
    import torch

    from single_person_pose_estimation_tpu.demo.demo import yolov5_adapter

    data = np.load(YOLO_FIXTURE)

    class StubResults:
        xyxy = [torch.from_numpy(data["xyxy"])]

    detect = yolov5_adapter(lambda img: StubResults(), conf_threshold=0.25)
    boxes = detect(np.zeros((480, 640, 3), np.uint8))
    # 4 person rows; conf==0.25 dropped (strict >) -> 3 kept, score order
    # as recorded (adapter preserves row order).
    assert len(boxes) == 3
    x, y, w, h, conf = boxes[0]
    np.testing.assert_allclose((x, y), (105.31, 80.24), rtol=1e-5)
    np.testing.assert_allclose((w, h), (215.66 - 105.31, 410.88 - 80.24),
                               rtol=1e-5)
    assert conf == pytest.approx(0.9213, rel=1e-5)
    assert all(b[4] > 0.25 for b in boxes)
    # dog/car/chair rows never leak through
    assert not any(abs(b[0] - 310.47) < 1e-3 for b in boxes)


def test_yolov5_adapter_pandas_api():
    """The reference's own access pattern: results.pandas().xyxy[0] with
    name/confidence columns (reference demo.py:31-32)."""
    import pandas as pd

    from single_person_pose_estimation_tpu.demo.demo import yolov5_adapter

    data = np.load(YOLO_FIXTURE)
    xyxy = data["xyxy"]
    df = pd.DataFrame({
        "xmin": xyxy[:, 0], "ymin": xyxy[:, 1],
        "xmax": xyxy[:, 2], "ymax": xyxy[:, 3],
        "confidence": xyxy[:, 4], "class": xyxy[:, 5].astype(int),
        "name": [str(n) for n in data["names"]],
    })

    class PandasView:
        xyxy = [df]

    class StubResults:
        xyxy = None  # force the pandas fallback

        def pandas(self):
            return PandasView()

    detect = yolov5_adapter(lambda img: StubResults(), conf_threshold=0.25)
    boxes = detect(np.zeros((480, 640, 3), np.uint8))
    assert len(boxes) == 3
    np.testing.assert_allclose(boxes[1][:2], (240.88, 110.40), rtol=1e-5)


def test_skeleton_rendering_uses_config_colors(demo):
    """Edges and markers take per-keypoint colors from the config palette
    (reference COCO_KEYPOINT_COLORS, default_config.py:70-78)."""
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    image = np.random.default_rng(2).uniform(
        0, 255, (120, 160, 3)).astype(np.uint8)
    demo.detect(image)
    fig, ax = plt.subplots()
    demo._plot_skeletons(ax)
    palette = {mcolors.to_rgba(c) for c in CFG.keypoint_colors}
    lines = ax.get_lines()
    assert lines, "no skeleton edges drawn"
    for line in lines:
        assert mcolors.to_rgba(line.get_color()) in palette
    assert ax.collections, "no keypoint markers drawn"
    for coll in ax.collections:
        for c in coll.get_facecolor():
            assert tuple(c) in palette
    plt.close(fig)


def test_webcam_codec_round_trip():
    from single_person_pose_estimation_tpu.data.images import encode_jpeg
    img = np.random.default_rng(2).integers(
        0, 255, (32, 32, 3)).astype(np.uint8)
    import base64
    data = "data:image/jpeg;base64," + base64.b64encode(
        encode_jpeg(img)).decode()
    back = webcam.js_to_image(data)
    assert back.shape == (32, 32, 3)

    overlay = np.zeros((16, 16, 4), np.uint8)
    overlay[4:8, 4:8] = [255, 0, 0, 255]
    s = webcam.overlay_to_bytes(overlay)
    assert s.startswith("data:image/png;base64,")


def test_colab_gates_raise_outside_colab(demo):
    with pytest.raises(RuntimeError, match="Colab"):
        webcam.take_photo(demo)
    with pytest.raises(RuntimeError, match="Colab"):
        webcam.start_video_stream(demo)


def test_model_utils_checkpoint_listing(tmp_path):
    from single_person_pose_estimation_tpu.training.checkpoint import CheckpointManager
    from single_person_pose_estimation_tpu.utils import model_utils

    model = StackedHourglass(num_stacks=1, num_channels=16)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                        input_shape=(1, 64, 64, 3))
    mgr = CheckpointManager(str(tmp_path / "ck"), async_checkpointing=False)
    mgr.save(1, state, {"epoch": 1})
    mgr.save(2, state, {"epoch": 2})
    mgr.maybe_promote_best(0.7, state, {"epoch": 2})
    mgr.close()

    epochs, has_best = model_utils.list_checkpoints(str(tmp_path / "ck"))
    assert epochs == [1, 2]
    assert has_best

    restored, meta = model_utils.load_model_from_checkpoint(
        model, str(tmp_path / "ck"), best=True, input_shape=(1, 64, 64, 3))
    assert meta["val_loss"] == 0.7
    restored, meta = model_utils.load_model_from_checkpoint(
        model, str(tmp_path / "ck"), input_shape=(1, 64, 64, 3))
    assert meta["epoch"] == 2


def test_run_on_video(tmp_path, demo):
    """Offline video processing: synthesize a tiny mp4, annotate it."""
    import cv2

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(5):
        w.write(rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    n = webcam.run_on_video(demo, src, out, max_frames=4)
    assert n == 4
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (64, 96, 3)
