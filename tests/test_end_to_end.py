"""System test: the whole framework loop must be SEMANTICALLY correct —
train on a small synthetic dataset until the model fits it, then predict,
decode, un-crop and score with the native OKS/PCK evaluators. High scores
require every stage (ETL coordinate frames, heatmap targets, model,
training, BN statistics, decode, un-cropping, evaluation protocol) to
agree end-to-end.

Design notes: keypoints carry visible color markers (so the task is
learnable from pixels, not just memorizable) and are spaced ~6 heatmap px
apart (PCK@0.05 of the bbox diagonal is ~2 heatmap px here — resolvable by
the quarter-pixel decode, unlike tightly-packed layouts). After the short
training, BN running stats (momentum .99 needs ~1e4 steps to converge) are
recalibrated with a momentum-0 pass before eval-mode prediction.
"""

import json
import os

import numpy as np
import pytest

from single_person_pose_estimation_tpu.configs.default_config import (
    COCO_KEYPOINT_LABELS,
    Config,
)
from single_person_pose_estimation_tpu.data import coco, pipeline
from single_person_pose_estimation_tpu.data.images import encode_jpeg
from single_person_pose_estimation_tpu.evaluation.oks import eval_oks
from single_person_pose_estimation_tpu.evaluation.pck import eval_pck
from single_person_pose_estimation_tpu.evaluation.predict import predict_ds
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.training import steps as steps_lib
from single_person_pose_estimation_tpu.training.trainer import Trainer


def make_marked_dataset(root, split, n_images=8):
    """Noise images with a distinctive color marker at each keypoint,
    keypoints spread widely over the person box."""
    img_dir = os.path.join(root, "images", split)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n_images):
        H = W = 160
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        name = f"{i:012d}.jpg"
        images.append({"id": i, "file_name": name, "width": W, "height": H,
                       "coco_url": ""})
        x, y, w, h = 20, 20, 120, 120
        kps = []
        for k in range(17):
            kx = x + 10 + (k % 5) * 25
            ky = y + 10 + (k // 5) * 28
            kps += [kx, ky, 2]
            img[max(0, ky - 2):ky + 3, max(0, kx - 2):kx + 3] = \
                [255 * (k % 2), 255 * ((k // 2) % 2), (k * 15) % 255]
        with open(os.path.join(img_dir, name), "wb") as f:
            f.write(encode_jpeg(img))
        annotations.append({"id": 1000 + i, "image_id": i, "iscrowd": 0,
                            "bbox": [x, y, w, h], "num_keypoints": 17,
                            "keypoints": kps, "category_id": 1})
    with open(os.path.join(ann_dir, f"person_keypoints_{split}.json"),
              "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": []}, f)


def test_full_loop_overfit_then_evaluate(tmp_path):
    root = str(tmp_path / "dataset")
    make_marked_dataset(root, "train2017")
    make_marked_dataset(root, "val2017")   # identical layout: overfit target
    cfg = Config().replace(
        dataset_dir=root,
        temporary_dir=str(tmp_path / "temp"),
        batch_size=8, num_examples_per_record=8, shuffle_buffer=8,
        hg_num_stacks=1, hg_num_channels=16,
        image_height=128, image_width=128, label_height=32, label_width=32,
        async_checkpointing=False, checkpoint_every_epochs=10000,
    )
    coco.gen_trainval_records(cfg)

    model = StackedHourglass(num_stacks=1, num_channels=16)
    builder = pipeline.DatasetBuilder(cfg)
    trainer = Trainer(model, builder, epochs=400, learning_rate=1e-2,
                      loss_str="weighted_mse", config=cfg, augment=False)
    trainer.train()

    # Recalibrate BN running stats on the train batches (momentum-0 pass).
    train_it, _ = builder.build_datasets()
    state = steps_lib.recalibrate_batch_stats(model, trainer.state,
                                              [next(train_it)])

    save = str(tmp_path / "result.json")
    preds = predict_ds(model, state, builder.get_ds_prediction(),
                       conf_threshold=0.05, save_path=save,
                       legacy_decode=True)
    assert len(preds) == 8
    assert os.path.exists(save)
    trainer.close()

    pck = eval_pck(preds, COCO_KEYPOINT_LABELS, pck_threshold=0.05,
                   verbose=False)
    mean_pck = float(np.mean(pck))
    assert mean_pck > 0.8, f"mean PCK {mean_pck}; per-label {pck}"

    stats = eval_oks(preds, cfg.valid_annot_file, verbose=False)
    assert stats[0] > 0.7, f"OKS AP {stats[0]}"
    assert stats[6] > 0.9, f"AR@.50 {stats[6]}"


def test_gt_heatmap_oracle_scores_perfectly(tmp_path):
    """Independent of any model: GT keypoints -> on-device heatmap render ->
    decode -> normalize -> un-crop -> OKS/PCK must score ~perfect. Pins the
    full measurement pipeline's coordinate algebra."""
    import jax.numpy as jnp

    from single_person_pose_estimation_tpu.ops.decode import decode_batch
    from single_person_pose_estimation_tpu.ops.heatmap import (
        render_heatmaps_batch,
    )

    root = str(tmp_path / "dataset")
    make_marked_dataset(root, "train2017", n_images=2)
    make_marked_dataset(root, "val2017")
    cfg = Config().replace(
        dataset_dir=root, temporary_dir=str(tmp_path / "temp"),
        batch_size=4, num_examples_per_record=8,
        image_height=128, image_width=128, label_height=32, label_width=32)
    coco.gen_trainval_records(cfg)
    builder = pipeline.DatasetBuilder(cfg)

    preds = []
    for images, metas in builder.get_ds_prediction():
        kx = np.stack([m["keypoints/x"] / m["bbox_w"] * 32 for m in metas])
        ky = np.stack([m["keypoints/y"] / m["bbox_h"] * 32 for m in metas])
        kv = np.stack([m["keypoints/vis"] for m in metas])
        hms = render_heatmaps_batch(jnp.asarray(kx), jnp.asarray(ky),
                                    jnp.asarray(kv), height=32, width=32)
        kps = np.asarray(decode_batch(hms, conf_threshold=0.05, legacy=True))
        for j, m in enumerate(metas):
            bw, bh = int(m["bbox_w"]), int(m["bbox_h"])
            bx, by = float(m["bbox_x"]), float(m["bbox_y"])
            preds.append({
                "xs/pred": (kps[j, :, 0] / 32 * bw + bx).tolist(),
                "ys/pred": (kps[j, :, 1] / 32 * bh + by).tolist(),
                "xs/gt": (np.asarray(m["keypoints/x"]) + bx).tolist(),
                "ys/gt": (np.asarray(m["keypoints/y"]) + by).tolist(),
                "vs": np.asarray(m["keypoints/vis"]).astype(int).tolist(),
                "confs": kps[j, :, 2].tolist(),
                "image_id": m["image_id"], "ann_id": m["ann_id"],
                "original_bbox": np.asarray(m["original_bbox"]).tolist(),
            })

    pck = eval_pck(preds, COCO_KEYPOINT_LABELS, pck_threshold=0.05,
                   verbose=False)
    assert float(np.mean(pck)) == 1.0
    stats = eval_oks(preds, cfg.valid_annot_file, verbose=False)
    assert stats[0] > 0.99
    assert stats[5] > 0.99
