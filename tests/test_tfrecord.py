"""TFRecord + Example codec tests: self round-trip, TF-oracle round-trip
in BOTH directions (our writer -> TF reader; TF writer -> our reader),
CRC verification, native/Python path equivalence."""

import os

import numpy as np
import pytest

from single_person_pose_estimation_tpu.data import example_codec, tfrecord


def sample_features():
    return {
        "ann_id": [12345],
        "image_id": [678],
        "image": [b"\x00\x01\x02jpegbytes\xff"],
        "image_path": [b"img/000001.jpg"],
        "coco_url": [b"http://example/1.jpg"],
        "width": [321],
        "height": [240],
        "keypoints/x": [1.5, 0.0, 63.25],
        "keypoints/y": [2.5, 0.0, 10.0],
        "keypoints/vis": [2, 0, 1],
        "keypoints/num": [2],
        "bbox_x": [-3.5],
        "bbox_y": [7.25],
        "original_bbox": [10.0, 20.0, 30.0, 40.0],
    }


def test_example_codec_round_trip():
    feats = sample_features()
    data = example_codec.encode_example(feats)
    out = example_codec.decode_example(data)
    assert set(out) == set(feats)
    assert out["ann_id"] == [12345]
    assert out["image"] == [b"\x00\x01\x02jpegbytes\xff"]
    np.testing.assert_allclose(out["keypoints/x"], [1.5, 0.0, 63.25])
    assert out["keypoints/vis"] == [2, 0, 1]
    assert out["bbox_x"] == [-3.5]


def test_negative_int64_round_trip():
    data = example_codec.encode_example({"v": [-5, 0, 7]})
    assert example_codec.decode_example(data)["v"] == [-5, 0, 7]


def test_crc32c_known_values():
    # Standard CRC32C test vectors.
    assert tfrecord.crc32c(b"") == 0
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_crc32c_matches_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_writer_reader_round_trip(tmp_path):
    path = str(tmp_path / "t.tfrec")
    records = [b"alpha", b"", b"x" * 10000]
    with tfrecord.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(tfrecord.iter_records(path))
    assert got == records


def test_native_matches_python(tmp_path):
    if not tfrecord.native_available():
        pytest.skip("native lib not built")
    path = str(tmp_path / "t.tfrec")
    records = [os.urandom(n) for n in (1, 100, 65536)]
    with tfrecord.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    via_python = list(tfrecord._iter_records_python(path, verify_crc=True))
    reader = tfrecord.TFRecordReader(path)
    via_native = list(reader)
    reader.close()
    assert via_python == via_native == records


def test_native_crc_matches_python():
    if not tfrecord.native_available():
        pytest.skip("native lib not built")
    lib = tfrecord._load_native()
    for data in (b"", b"123456789", os.urandom(1000)):
        assert lib.tfrec_crc32c(data, len(data)) == tfrecord.crc32c(data)


def test_corrupt_record_rejected(tmp_path):
    path = str(tmp_path / "t.tfrec")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(b"hello world")
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a data byte
    open(path, "wb").write(bytes(raw))
    if tfrecord.native_available():
        with pytest.raises(IOError):
            tfrecord.TFRecordReader(path)
    else:
        with pytest.raises(IOError):
            list(tfrecord._iter_records_python(path, verify_crc=True))


def test_hostile_length_field_rejected_not_segfault(tmp_path):
    """A record whose length field is near 2^64 but carries a VALID
    length-CRC (CRC32C is not cryptographic — anyone can compute it) must
    be rejected as corrupt, not wrap the native reader's signed bounds
    check and read outside the mmap (tfrecord_io.cpp bounds guard)."""
    import struct

    path = str(tmp_path / "hostile.tfrec")
    length = struct.pack("<Q", 0xFFFFFFFFFFFFFFF0)
    with open(path, "wb") as f:
        f.write(length)
        f.write(struct.pack("<I", tfrecord.masked_crc32c(length)))
        f.write(b"\x00" * 64)  # some trailing bytes to walk into
    if tfrecord.native_available():
        with pytest.raises(IOError):
            tfrecord.TFRecordReader(path)
    with pytest.raises(IOError):
        list(tfrecord._iter_records_python(path, verify_crc=True))


def test_shard_filename_convention(tmp_path):
    d = str(tmp_path / "train")
    name = tfrecord.shard_filename(d, 3, 2048)
    assert os.path.basename(name) == "file_train_03-2048.tfrec"
    assert tfrecord.count_examples_from_filenames(
        [name, tfrecord.shard_filename(d, 4, 100)]) == 2148


# ---------------------------------------------------------------------------
# TF oracle round-trips
# ---------------------------------------------------------------------------

def _tf():
    return pytest.importorskip("tensorflow")


def test_our_writer_readable_by_tf(tmp_path):
    tf = _tf()
    path = str(tmp_path / "ours.tfrec")
    feats = sample_features()
    with tfrecord.TFRecordWriter(path) as w:
        w.write(example_codec.encode_example(feats))

    ds = tf.data.TFRecordDataset([path])
    raw = next(iter(ds))
    desc = {
        "ann_id": tf.io.FixedLenFeature([], tf.int64),
        "image": tf.io.FixedLenFeature([], tf.string),
        "keypoints/x": tf.io.VarLenFeature(tf.float32),
        "keypoints/vis": tf.io.VarLenFeature(tf.int64),
        "bbox_x": tf.io.FixedLenFeature([], tf.float32),
    }
    ex = tf.io.parse_single_example(raw, desc)
    assert int(ex["ann_id"]) == 12345
    assert bytes(ex["image"].numpy()) == feats["image"][0]
    np.testing.assert_allclose(
        tf.sparse.to_dense(ex["keypoints/x"]).numpy(), [1.5, 0.0, 63.25])
    assert tf.sparse.to_dense(ex["keypoints/vis"]).numpy().tolist() == [2, 0, 1]
    assert float(ex["bbox_x"]) == -3.5


def test_tf_writer_readable_by_us(tmp_path):
    tf = _tf()
    path = str(tmp_path / "tf.tfrec")
    feats = sample_features()

    def bl(v): return tf.train.Feature(bytes_list=tf.train.BytesList(value=v))
    def fl(v): return tf.train.Feature(float_list=tf.train.FloatList(value=v))
    def il(v): return tf.train.Feature(int64_list=tf.train.Int64List(value=v))

    ex = tf.train.Example(features=tf.train.Features(feature={
        "ann_id": il(feats["ann_id"]),
        "image": bl(feats["image"]),
        "keypoints/x": fl(feats["keypoints/x"]),
        "keypoints/vis": il(feats["keypoints/vis"]),
        "bbox_x": fl(feats["bbox_x"]),
    }))
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    records = list(tfrecord.iter_records(path))
    assert len(records) == 1
    out = example_codec.decode_example(records[0])
    assert out["ann_id"] == [12345]
    assert out["image"] == [feats["image"][0]]
    np.testing.assert_allclose(out["keypoints/x"], feats["keypoints/x"])
    assert out["keypoints/vis"] == feats["keypoints/vis"]
    np.testing.assert_allclose(out["bbox_x"], feats["bbox_x"])


def test_tf_written_full_schema_through_pipeline(tmp_path):
    """Interop: a record written by TensorFlow with the reference's full
    14-feature schema must flow through OUR pipeline parsers (train and
    prediction) with correct values — the reference's shards are directly
    consumable."""
    tf = _tf()
    from single_person_pose_estimation_tpu.configs.default_config import Config
    from single_person_pose_estimation_tpu.data import pipeline
    from single_person_pose_estimation_tpu.data.images import encode_jpeg

    rng = np.random.default_rng(5)
    crop = rng.integers(0, 255, (80, 80, 3)).astype(np.uint8)
    jpeg = encode_jpeg(crop)
    K = 17
    xs = [float(5 + 4 * k) for k in range(K)]
    ys = [float(7 + 3 * k) for k in range(K)]
    vs = [2] * K

    def bl(v): return tf.train.Feature(bytes_list=tf.train.BytesList(value=v))
    def fl(v): return tf.train.Feature(float_list=tf.train.FloatList(value=v))
    def il(v): return tf.train.Feature(int64_list=tf.train.Int64List(value=v))

    ex = tf.train.Example(features=tf.train.Features(feature={
        "ann_id": il([42]), "image_id": il([7]),
        "image": bl([jpeg]), "image_path": bl([b"x.jpg"]),
        "coco_url": bl([b"http://x"]),
        "width": il([80]), "height": il([80]),
        "keypoints/x": fl(xs), "keypoints/y": fl(ys),
        "keypoints/vis": il(vs), "keypoints/num": il([K]),
        "bbox_x": fl([-3.5]), "bbox_y": fl([10.0]),
        # ETL-consistent: crop side == int(max(w, h) * bbox_scale)
        # == int(64 * 1.25) == 80, like every genuine reference shard
        # (gen_tfrecords.py:27,77-78 computes both from the same square).
        "original_bbox": fl([1.0, 2.0, 30.0, 64.0]),
    }))
    path = str(tmp_path / "ref_style.tfrec")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    cfg = Config().replace(image_height=64, image_width=64,
                           label_height=16, label_width=16)
    record = next(tfrecord.iter_records(path))

    parsed = pipeline._parse_example(record, cfg, training=True)
    assert parsed["image"].shape == (64, 64, 3)
    np.testing.assert_allclose(parsed["kx"],
                               np.asarray(xs) / 80 * 16, rtol=1e-5)
    np.testing.assert_allclose(parsed["ky"],
                               np.asarray(ys) / 80 * 16, rtol=1e-5)
    assert parsed["kv"].tolist() == vs

    img, meta = pipeline._parse_prediction_example(record, cfg)
    assert meta["ann_id"] == 42 and meta["image_id"] == 7
    assert meta["bbox_x"] == -3.5 and meta["bbox_w"] == 80
    np.testing.assert_allclose(meta["original_bbox"], [1, 2, 30, 64])
