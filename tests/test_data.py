"""Data layer tests: COCO ETL on a synthetic mini-dataset, record
round-trip through the input pipeline, crop_and_pad parity with the
reference's tf.image implementation."""

import json
import os

import numpy as np
import pytest

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.data import coco, pipeline, tfrecord
from single_person_pose_estimation_tpu.data.images import encode_jpeg


def make_synthetic_coco(root, split="train2017", n_images=3, people_per=2):
    """Tiny COCO-format dataset: gradient images + synthetic person boxes."""
    img_dir = os.path.join(root, "images", split)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1000
    for i in range(n_images):
        H, W = 240, 320
        img = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
        name = f"{i:012d}.jpg"
        with open(os.path.join(img_dir, name), "wb") as f:
            f.write(encode_jpeg(img))
        images.append({"id": i, "file_name": name, "width": W, "height": H,
                       "coco_url": f"http://x/{name}"})
        for p in range(people_per):
            x, y, w, h = 40 + 60 * p, 30, 70, 150
            kps = []
            for k in range(17):
                kps += [x + 10 + (k % 5) * 8, y + 10 + (k // 5) * 20, 2]
            annotations.append({
                "id": ann_id, "image_id": i, "iscrowd": 0,
                "bbox": [x, y, w, h], "num_keypoints": 17,
                "keypoints": kps, "category_id": 1,
            })
            ann_id += 1
    # One crowd + one sparse annotation that must be filtered out.
    annotations.append({"id": ann_id, "image_id": 0, "iscrowd": 1,
                        "bbox": [0, 0, 50, 50], "num_keypoints": 17,
                        "keypoints": [1, 1, 2] * 17, "category_id": 1})
    annotations.append({"id": ann_id + 1, "image_id": 0, "iscrowd": 0,
                        "bbox": [0, 0, 50, 50], "num_keypoints": 2,
                        "keypoints": [1, 1, 2] * 17, "category_id": 1})

    annot = {"images": images, "annotations": annotations, "categories": []}
    ann_file = os.path.join(ann_dir, f"person_keypoints_{split}.json")
    with open(ann_file, "w") as f:
        json.dump(annot, f)
    return ann_file


@pytest.fixture
def mini_cfg(tmp_path):
    root = str(tmp_path / "dataset")
    make_synthetic_coco(root, "train2017")
    make_synthetic_coco(root, "val2017", n_images=2, people_per=1)
    return Config().replace(dataset_dir=root, batch_size=4,
                            num_examples_per_record=5, shuffle_buffer=8)


def test_load_person_examples_filters(mini_cfg):
    exs = coco.load_person_examples(mini_cfg.train_annot_file,
                                    mini_cfg.min_num_keypoints)
    assert len(exs) == 6            # 3 images x 2 people; crowd+sparse dropped
    assert all(e.num_keypoints >= 5 for e in exs)


def test_etl_and_pipeline_round_trip(mini_cfg):
    coco.gen_trainval_records(mini_cfg)
    builder = pipeline.DatasetBuilder(mini_cfg)
    assert builder.num_train_examples == 6
    assert builder.num_valid_examples == 2
    # Shard naming: 6 examples, 5/record -> 2 shards (5, 1).
    names = [os.path.basename(p) for p in builder.train_filenames]
    assert names == ["file_train_00-5.tfrec", "file_train_01-1.tfrec"]

    train_it, valid_it = builder.build_datasets()
    batch = next(train_it)
    assert batch["image"].shape == (4, 256, 256, 3)
    assert batch["image"].dtype == np.float32
    assert 0.0 <= batch["image"].min() and batch["image"].max() <= 1.0
    assert batch["kx"].shape == (4, 17)
    # Keypoints scaled into heatmap space.
    assert (batch["kx"] >= 0).all() and (batch["kx"] < 64 + 1e-5).all()
    vbatch = next(valid_it)
    assert vbatch["image"].shape[0] == 2   # only 2 valid examples


def test_keypoint_scaling_correct(mini_cfg):
    """A keypoint at crop-pixel (px, py) in a (S x S) crop must land at
    px/S*64 in heatmap space (prepare_example, dataset_builder.py:104-111)."""
    coco.gen_trainval_records(mini_cfg)
    builder = pipeline.DatasetBuilder(mini_cfg)
    recs = list(tfrecord.iter_records(builder.valid_filenames[0]))
    from single_person_pose_estimation_tpu.data import example_codec
    ex = example_codec.decode_example(recs[0])
    parsed = pipeline._parse_example(recs[0], mini_cfg, training=False)
    want = np.zeros(17, np.float32)
    xs = ex["keypoints/x"]
    want[:len(xs)] = np.asarray(xs) / ex["width"][0] * 64
    np.testing.assert_allclose(parsed["kx"], want, rtol=1e-5)


def test_prediction_metadata(mini_cfg):
    coco.gen_trainval_records(mini_cfg)
    builder = pipeline.DatasetBuilder(mini_cfg)
    images, metas = next(builder.get_ds_prediction())
    assert images.shape[0] == len(metas) == 2
    m = metas[0]
    for key in ("ann_id", "image_id", "bbox_x", "bbox_y", "bbox_w", "bbox_h",
                "original_bbox", "keypoints/x", "keypoints/vis"):
        assert key in m
    assert m["original_bbox"].shape == (4,)
    # Crop is square: stored width == height == square bbox side.
    assert m["bbox_w"] == m["bbox_h"]


def test_train_stream_is_shuffled_and_infinite(mini_cfg):
    coco.gen_trainval_records(mini_cfg)
    builder = pipeline.DatasetBuilder(mini_cfg)
    train_it, _ = builder.build_datasets()
    # 6 examples, batch 4: draw several batches, stream must not stop.
    batches = [next(train_it) for _ in range(5)]
    assert all(b["image"].shape[0] in (2, 4) for b in batches)


def test_crop_and_pad_np_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, size=(100, 120, 3)).astype(np.uint8)

    for bbox in [(20.6, 10.2, 50.9, 50.9),      # interior, fractional
                 (-15.5, -9.1, 60.0, 60.0),     # beyond top-left
                 (90.0, 70.0, 55.3, 55.3),      # beyond bottom-right
                 (-10.0, 60.0, 80.0, 80.0)]:    # mixed
        got = coco.crop_and_pad_np(image, bbox)

        x, y, w, h = bbox
        off_w = int(abs(x)) if x < 0 else 0
        off_h = int(abs(y)) if y < 0 else 0
        tw = 120 + off_w
        th = 100 + off_h
        if x + w > 120:
            tw += int(x + w - 120) + 1
        if y + h > 100:
            th += int(y + h - 100) + 1
        padded = tf.image.pad_to_bounding_box(image, off_h, off_w, th, tw)
        want = tf.image.crop_to_bounding_box(
            padded, int(max(y, 0)), int(max(x, 0)), int(h), int(w)).numpy()
        np.testing.assert_array_equal(got, want)


def test_etl_keypoint_filtering(mini_cfg):
    """ETL keypoint shift/filter must agree with the jit-able
    ops.geometry.keypoints_to_crop_frame."""
    from single_person_pose_estimation_tpu.ops import geometry
    exs = coco.load_person_examples(mini_cfg.train_annot_file, 5)
    ex = exs[0]
    sq = coco.transform_bbox_square_np(ex.bbox, 1.25)
    feats = coco.build_example_features(
        np.zeros((ex.height, ex.width, 3), np.uint8), ex, 1.25)
    xs = np.asarray(ex.keypoints[0::3], np.float32)
    ys = np.asarray(ex.keypoints[1::3], np.float32)
    vs = np.asarray(ex.keypoints[2::3], np.int32)
    gx, gy, gv = geometry.keypoints_to_crop_frame(xs, ys, vs, np.asarray(sq))
    np.testing.assert_allclose(np.asarray(feats["keypoints/x"]),
                               np.asarray(gx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feats["keypoints/y"]),
                               np.asarray(gy), rtol=1e-5)
    assert feats["keypoints/vis"] == np.asarray(gv).tolist()


def test_uint8_wire_parse(mini_cfg):
    """train_transfer_dtype="uint8": parse returns quantized uint8 within
    1 LSB of the f32 path; prediction/eval parsing stays f32."""
    coco.gen_trainval_records(mini_cfg)
    builder = pipeline.DatasetBuilder(mini_cfg)
    recs = list(tfrecord.iter_records(builder.train_filenames[0]))
    cfg8 = mini_cfg.replace(train_transfer_dtype="uint8")
    a = pipeline._parse_example(recs[0], mini_cfg, training=True)
    b = pipeline._parse_example(recs[0], cfg8, training=True)
    assert a["image"].dtype == np.float32
    assert b["image"].dtype == np.uint8
    np.testing.assert_allclose(b["image"].astype(np.float32) / 255.0,
                               a["image"], atol=1.01 / 255.0)
    np.testing.assert_array_equal(a["kx"], b["kx"])
    # eval parsing is unaffected by the train wire setting
    c = pipeline._parse_example(recs[0], cfg8, training=False)
    assert c["image"].dtype == np.float32


def test_host_workers_parallel_map_is_ordered(mini_cfg):
    """host_workers>1 must produce byte-identical batches in the same
    order as the serial path (ordered bounded-window map)."""
    coco.gen_trainval_records(mini_cfg)
    cfg1 = mini_cfg.replace(host_workers=1, shuffle_buffer=0)
    cfg4 = mini_cfg.replace(host_workers=4, shuffle_buffer=0)
    b1 = pipeline.DatasetBuilder(cfg1)
    b4 = pipeline.DatasetBuilder(cfg4)
    it1 = b1._batches(b1.train_filenames, shuffle=False, repeat=False,
                      training=True)
    it4 = b4._batches(b4.train_filenames, shuffle=False, repeat=False,
                      training=True)
    for x1, x4 in zip(it1, it4):
        for k in x1:
            np.testing.assert_array_equal(x1[k], x4[k])


def test_record_image_size_preresizes_and_scales_keypoints(mini_cfg):
    """record_image_size stores an SxS crop with keypoints scaled into the
    resized frame; the pipeline's crop-space -> heatmap-space rescale is
    unchanged, so decoded kx/ky match the native-resolution records."""
    from single_person_pose_estimation_tpu.data.images import decode_jpeg

    exs = coco.load_person_examples(mini_cfg.train_annot_file, 5)
    ex = exs[0]
    img = np.zeros((ex.height, ex.width, 3), np.uint8)
    native = coco.build_example_features(img, ex, 1.25)
    small = coco.build_example_features(img, ex, 1.25, record_size=128)

    dec = decode_jpeg(small["image"][0])
    assert dec.shape == (128, 128, 3)
    assert small["width"] == [128] and small["height"] == [128]
    # Keypoints scaled by 128 / native crop dims; zeros stay zero.
    nw, nh = native["width"][0], native["height"][0]
    for k in range(17):
        np.testing.assert_allclose(small["keypoints/x"][k],
                                   native["keypoints/x"][k] * 128 / nw,
                                   rtol=1e-6)
        np.testing.assert_allclose(small["keypoints/y"][k],
                                   native["keypoints/y"][k] * 128 / nh,
                                   rtol=1e-6)
    assert small["keypoints/vis"] == native["keypoints/vis"]


def test_record_image_size_end_to_end_pipeline(mini_cfg, tmp_path):
    """gen records with record_image_size=128 -> DatasetBuilder batches:
    heatmap-space keypoints must match the native-records dataset exactly
    (the rescale is exact); images agree to resize-interpolation error."""
    cfg_small = mini_cfg.replace(record_image_size=128)
    exs = coco.load_person_examples(mini_cfg.train_annot_file, 5)
    coco.generate_records(exs, mini_cfg, is_train=True)
    small_root = str(tmp_path / "small")
    import shutil
    os.makedirs(small_root)
    shutil.copytree(os.path.join(mini_cfg.dataset_dir, "annotations"),
                    os.path.join(small_root, "annotations"))
    cfg_small = cfg_small.replace(dataset_dir=small_root)
    os.makedirs(cfg_small.train_images_dir, exist_ok=True)
    # reuse the same source images
    shutil.rmtree(cfg_small.train_images_dir)
    shutil.copytree(mini_cfg.train_images_dir, cfg_small.train_images_dir)
    coco.generate_records(exs, cfg_small, is_train=True)

    def first_batch(cfg):
        b = pipeline.DatasetBuilder(cfg.replace(shuffle_buffer=0))
        it, _ = b.build_datasets()
        batch = next(it)
        it.close()
        return batch

    a = first_batch(mini_cfg)
    b = first_batch(cfg_small)
    np.testing.assert_allclose(np.asarray(a["kx"]), np.asarray(b["kx"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["ky"]), np.asarray(b["ky"]),
                               atol=1e-4)
    assert np.asarray(a["kv"]).tolist() == np.asarray(b["kv"]).tolist()
    # Images: native goes crop->256 in one resize, small goes
    # crop->128->256; contents agree only loosely on noise images, but
    # shapes and range must match.
    assert np.asarray(b["image"]).shape == np.asarray(a["image"]).shape


def test_record_image_size_eval_uncrop(mini_cfg):
    """Pre-resized records must evaluate correctly: the prediction meta
    carries the TRUE square-crop side (recovered from original_bbox) for
    the un-crop mapping, while GT keypoints normalize by the stored frame.
    A GT point must round-trip back to its original-image coordinates."""
    exs = coco.load_person_examples(mini_cfg.train_annot_file, 5)
    ex = exs[0]
    img = np.zeros((ex.height, ex.width, 3), np.uint8)
    feats = coco.build_example_features(img, ex, mini_cfg.bbox_scale,
                                        record_size=128)
    from single_person_pose_estimation_tpu.data import example_codec
    rec = example_codec.encode_example(feats)
    _, meta = pipeline._parse_prediction_example(rec, mini_cfg)

    sq = coco.transform_bbox_square_np(ex.bbox, mini_cfg.bbox_scale)
    assert meta["bbox_w"] == int(sq[2]) and meta["bbox_h"] == int(sq[3])
    assert meta["frame_w"] == 128 and meta["frame_h"] == 128

    # Round-trip the first visible GT keypoint to original-image coords
    # through the predict_ds mapping (normalize by frame, scale by bbox).
    k = next(i for i, v in enumerate(meta["keypoints/vis"]) if v > 0)
    x_orig = ex.keypoints[3 * k]
    got = (meta["keypoints/x"][k] / meta["frame_w"]) * meta["bbox_w"] \
        + meta["bbox_x"]
    # int truncations in the crop + the 128px quantization bound the error.
    assert abs(got - x_orig) <= sq[2] / 128 + 1.0, (got, x_orig)

    # Native-resolution records keep the old identity (bbox == frame).
    feats_n = coco.build_example_features(img, ex, mini_cfg.bbox_scale)
    _, meta_n = pipeline._parse_prediction_example(
        example_codec.encode_example(feats_n), mini_cfg)
    assert meta_n["bbox_w"] == meta_n["frame_w"] == int(sq[2])


def test_prefetcher_propagates_producer_error():
    """A failing producer (corrupt record, decode error) must surface to
    the consumer, not masquerade as a clean end-of-data StopIteration
    that silently ends an 'infinite' train loop."""

    def bad_gen():
        yield 1
        raise ValueError("corrupt JPEG")

    pf = pipeline._Prefetcher(bad_gen())
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(pf)


def test_prefetcher_delivers_sentinel_against_full_queue():
    """End-of-data with a full queue: the sentinel must still arrive once
    the consumer drains (put_nowait used to drop it -> consumer hang)."""
    import threading

    pf = pipeline._Prefetcher(iter(range(8)), depth=2)
    got = []
    done = threading.Event()

    def consume():
        got.extend(pf)
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=30), "consumer hung waiting for the sentinel"
    assert got == list(range(8))


def test_builder_close_reaps_decode_workers(mini_cfg):
    """it.close() must shut down the per-iterator decode thread pool, not
    leak 'spe-decode' threads for the process lifetime."""
    import threading
    import time

    coco.gen_trainval_records(mini_cfg)
    cfg = mini_cfg.replace(host_workers=2)
    builder = pipeline.DatasetBuilder(cfg)
    train_it, valid_it = builder.build_datasets()
    next(train_it)
    assert any(t.name.startswith("spe-decode")
               for t in threading.enumerate())
    train_it.close()
    valid_it.close()
    deadline = time.time() + 30
    while time.time() < deadline:
        if not any(t.name.startswith("spe-decode") and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.2)
    leaked = [t.name for t in threading.enumerate()
              if t.name.startswith("spe-decode") and t.is_alive()]
    assert not leaked, leaked
