"""Tests for the frozen Config dataclass: reference-default parity,
hashability, JSON round-trip."""

import numpy as np

from single_person_pose_estimation_tpu.configs.default_config import (
    COCO_INDEX_FLIP_PAIRS,
    COCO_KEYPOINT_LABELS,
    COCO_SKELETON,
    Config,
)


def test_reference_defaults():
    # Values from reference configs/default_config.py:4-28.
    cfg = Config()
    assert cfg.num_keypoints == 17
    assert cfg.min_num_keypoints == 5
    assert cfg.bbox_scale == 1.25
    assert cfg.num_examples_per_record == 2048
    assert cfg.image_shape == (256, 256, 3)
    assert cfg.label_shape == (64, 64, 17)
    assert cfg.gaussian_kernel == 7
    assert cfg.hm_activation == "sigmoid"
    assert cfg.hm_sigma == 1.0
    assert cfg.hg_num_channels == 256
    assert cfg.hg_num_stacks == 2
    assert cfg.batch_size == 16
    assert cfg.shuffle_buffer == 1000
    assert cfg.learning_rate == 0.01


def test_skeleton_metadata():
    assert len(COCO_KEYPOINT_LABELS) == 17
    assert COCO_KEYPOINT_LABELS[0] == "nose"
    assert len(COCO_INDEX_FLIP_PAIRS) == 8
    skel = np.asarray(COCO_SKELETON)
    assert skel.shape == (19, 2)
    assert skel.min() >= 0 and skel.max() <= 16
    # First edge: reference (16,14) 1-indexed -> (15,13) 0-indexed.
    assert tuple(skel[0]) == (15, 13)


def test_hashable_for_jit_static_arg():
    assert hash(Config()) == hash(Config())
    assert hash(Config()) != hash(Config(hg_num_stacks=4))


def test_replace_and_json_round_trip():
    cfg = Config().replace(hg_num_stacks=4, learning_rate=1e-3)
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.hg_num_stacks == 4


def test_paths():
    cfg = Config()
    assert cfg.train_tfrecords_dir == "dataset/tfrecords/train"
    assert cfg.checkpoints_path == "temp/checkpoints"


def test_config_rejects_bad_enum_values():
    """Typos in the string-enum fields must error at construction, not
    silently select a fallback path (e.g. 'unit8' losing the uint8 wire)."""
    import pytest

    for field, bad in [("train_transfer_dtype", "unit8"),
                       ("compute_dtype", "bf16"),
                       ("front_s2d", "yes"),
                       ("hm_activation", "softmax")]:
        with pytest.raises(ValueError, match=field):
            Config().replace(**{field: bad})
