"""IoU-loss convergence on the REAL TPU, through the full Trainer stack.

VERDICT r2 Missing #1 / Next #2: the published recipe's loss (reference
loss.py:23-28; Train.ipynb cells 14-20 trained the OKS-0.574 model with
it) had never been shown to converge in this framework — PERF.md only
recorded that IoU overfits far slower than weighted_mse. This script runs
the published-style recipe end to end on hardware:

  1. writes a synthetic marker dataset as record shards on disk,
  2. trains S4/256 (bf16) with a weighted_mse warmup via the real Trainer
     (DatasetBuilder -> host prefetch -> jitted step -> Orbax checkpoints),
  3. constructs a SECOND Trainer with loss='iou' and resume_training() —
     the reference's resume recipe (trainer.py:73-178): full-state restore
     (params + BN + Adam moments + PRNG) then the new loss/lr take over,
  4. asserts the IoU loss falls through fine-tuning and the decoded
     keypoints land sub-2-px (heatmap space) on the markers,
  5. (VERDICT r3 Next #6) finishes with the FULL evaluation protocol on
     the held-out valid split — evaluation.predict_ds (fused forward +
     on-device decode, un-crop to image coords) -> eval_oks + eval_pck
     against a COCO-format GT file — and gates on the AP, so TPU-trained
     weights produce an OKS score through the same chain as the
     reference's published 0.574 (evaluation.ipynb cells 6-9,
     eval.py:99-146).

Usage (real TPU): python scripts/validate_train_iou_tpu.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.data import example_codec
from single_person_pose_estimation_tpu.data.images import encode_jpeg
from single_person_pose_estimation_tpu.data.pipeline import DatasetBuilder
from single_person_pose_estimation_tpu.data.tfrecord import TFRecordWriter
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.ops.decode import decode_batch
from single_person_pose_estimation_tpu.training import steps
from single_person_pose_estimation_tpu.training.trainer import Trainer

ROOT = "/tmp/spe_iou_validate"
SIZE = 256
N_TRAIN, N_VALID = 128, 16
WARMUP_EPOCHS = 50      # x8 steps = 400 weighted_mse steps
IOU_EPOCHS = 75         # x8 steps = 600 iou fine-tune steps


def marker_example(rng, idx):
    """A noise image with 17 distinct color markers; keypoints at marker
    centers in crop-pixel space (the record format the ETL emits).
    Includes the prediction-path metadata (ids + un-crop geometry): the
    crop IS the square bbox anchored at the origin, so crop coords ==
    original-image coords and the OKS GT can share them."""
    img = rng.uniform(0, 255, (SIZE, SIZE, 3)).astype(np.uint8)
    kx = np.zeros(17, np.float32)
    ky = np.zeros(17, np.float32)
    jx, jy = int(idx % 8), int((idx // 8) % 8)
    for k in range(17):
        x = 32 + (k % 5) * 44 + jx
        y = 32 + (k // 5) * 48 + jy
        img[max(0, y - 5):y + 6, max(0, x - 5):x + 6] = [
            255 * (k % 2), 255 * ((k // 2) % 2), (k * 15) % 255]
        kx[k], ky[k] = x, y
    feats = {
        "ann_id": [1000 + idx], "image_id": [idx],
        "image": [encode_jpeg(img)],
        "width": [float(SIZE)], "height": [float(SIZE)],
        "bbox_x": [0.0], "bbox_y": [0.0],
        # original person bbox whose x1.25 square expansion = the crop.
        "original_bbox": [0.0, 0.0, SIZE / 1.25, SIZE / 1.25],
        "keypoints/x": [float(v) for v in kx],
        "keypoints/y": [float(v) for v in ky],
        "keypoints/vis": [2] * 17,
    }
    return feats, kx, ky


def write_dataset():
    import json

    shutil.rmtree(ROOT, ignore_errors=True)
    rng = np.random.default_rng(0)
    for split, n in (("train", N_TRAIN), ("valid", N_VALID)):
        d = os.path.join(ROOT, "tfrecords", split)
        os.makedirs(d, exist_ok=True)
        images, annotations = [], []
        with TFRecordWriter(
                os.path.join(d, f"file_{split}_00-{n}.tfrec")) as w:
            for i in range(n):
                feats, kx, ky = marker_example(rng, i)
                w.write(example_codec.encode_example(feats))
                kps = []
                for k in range(17):
                    kps += [float(kx[k]), float(ky[k]), 2]
                images.append({"id": i, "width": SIZE, "height": SIZE,
                               "file_name": f"{i:012d}.jpg"})
                annotations.append({
                    "id": 1000 + i, "image_id": i, "iscrowd": 0,
                    "bbox": [0.0, 0.0, SIZE / 1.25, SIZE / 1.25],
                    "num_keypoints": 17, "keypoints": kps,
                    "category_id": 1})
        # COCO-format GT for the OKS gate (same layout the ETL reads).
        ann_dir = os.path.join(ROOT, "annotations")
        os.makedirs(ann_dir, exist_ok=True)
        coco_split = "train2017" if split == "train" else "val2017"
        with open(os.path.join(
                ann_dir, f"person_keypoints_{coco_split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": []}, f)


def main():
    write_dataset()
    cfg = Config().replace(
        dataset_dir=ROOT, temporary_dir=os.path.join(ROOT, "temp"),
        batch_size=16, checkpoint_every_epochs=25,
        async_checkpointing=False, shuffle_buffer=64)
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)

    # Phase 1: weighted_mse warmup (gets the sigma=1 Gaussians roughly in
    # place; plain IoU-from-scratch needs the published 120-epoch budget —
    # its gradients are near-zero until predictions overlap the targets).
    t0 = time.time()
    builder = DatasetBuilder(cfg)
    tr = Trainer(model, builder, epochs=WARMUP_EPOCHS, learning_rate=5e-3,
                 loss_str="weighted_mse", config=cfg, augment=False)
    tr.train()
    warmup_s = time.time() - t0
    print(f"warmup done in {warmup_s:.0f}s", flush=True)

    # Phase 2: IoU fine-tune via the Trainer's RESUME path (full-state
    # restore from the warmup checkpoint, new loss + lr).
    t0 = time.time()
    tr2 = Trainer(model, DatasetBuilder(cfg), epochs=IOU_EPOCHS,
                  learning_rate=1e-3, loss_str="iou", config=cfg,
                  augment=False)
    tr2.resume_training()
    print(f"iou fine-tune done in {time.time() - t0:.0f}s", flush=True)

    # The IoU loss must have FALLEN over the fine-tune session.
    # Session CSVs mirror the reference's Keras CSVLogger layout (epoch
    # column per-session 0-based and unnamed; filenames sort by the
    # lexicographic glob the reference uses), so identify the IoU
    # session's log as the newest file and read it directly.
    import csv
    import glob
    newest = max(glob.glob(os.path.join(cfg.logs_path, "log_*.csv")),
                 key=os.path.getmtime)
    with open(newest, newline="") as f:
        iou_rows = list(csv.DictReader(f))
    assert len(iou_rows) == IOU_EPOCHS, (newest, len(iou_rows))
    first_iou = float(iou_rows[0]["loss"])
    last_iou = float(iou_rows[-1]["loss"])
    print(f"iou loss: epoch {WARMUP_EPOCHS + 1} = {first_iou:.4f} -> "
          f"epoch {WARMUP_EPOCHS + IOU_EPOCHS} = {last_iou:.4f}", flush=True)

    # Decode accuracy on a training batch with recalibrated BN stats.
    state = tr2.state
    it, _ = DatasetBuilder(cfg).build_datasets()
    batch = next(it)
    it.close()
    state = steps.recalibrate_batch_stats(model, state,
                                          [{"image": batch["image"]}])
    hms = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      batch["image"][:8], train=False)[-1]
    dec = np.asarray(decode_batch(hms))
    kx = np.asarray(batch["kx"][:8])
    ky = np.asarray(batch["ky"][:8])
    err = np.hypot(dec[..., 0] - kx, dec[..., 1] - ky)
    print(f"decode err px(64-space): mean {err.mean():.2f} "
          f"max {err.max():.2f}", flush=True)

    # Phase 3 (VERDICT r3 Next #6): the FULL evaluation protocol on the
    # HELD-OUT valid split — fused predict + on-device decode + un-crop
    # (evaluation/predict.py) scored by the native COCOeval-protocol OKS
    # and PCK against the COCO-format GT written alongside the records.
    from single_person_pose_estimation_tpu.configs.default_config import (
        COCO_KEYPOINT_LABELS,
    )
    from single_person_pose_estimation_tpu.evaluation.oks import eval_oks
    from single_person_pose_estimation_tpu.evaluation.pck import eval_pck
    from single_person_pose_estimation_tpu.evaluation.predict import (
        predict_ds,
    )

    preds = predict_ds(model, state, DatasetBuilder(cfg).get_ds_prediction(),
                       conf_threshold=0.05,
                       save_path=os.path.join(ROOT, "result.json"))
    assert len(preds) == N_VALID, len(preds)
    stats = eval_oks(preds, cfg.valid_annot_file, verbose=False)
    pck = eval_pck(preds, COCO_KEYPOINT_LABELS, pck_threshold=0.05,
                   verbose=False)
    mean_pck = float(np.mean(pck))
    print(f"held-out OKS AP {stats[0]:.3f} AP50 {stats[1]:.3f} "
          f"AR {stats[5]:.3f}; mean PCK@0.05 {mean_pck:.3f}", flush=True)

    ok = (last_iou < first_iou * 0.8 and err.mean() < 2.0
          and stats[0] > 0.70 and mean_pck > 0.80)
    print("VALIDATE_TRAIN_IOU_TPU:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
