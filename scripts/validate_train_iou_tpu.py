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
N_TRAIN, N_VALID = 256, 20
WARMUP_EPOCHS = 60      # x16 steps = 960 weighted_mse steps
IOU_EPOCHS = 80         # x16 steps = 1280 iou fine-tune steps

# SPE_VALIDATE_SMOKE=1: tiny model / few epochs on forced CPU — checks the
# script's plumbing (hard split, eval protocol, oracle agreement) without
# hardware; the band/sensitivity gates become report-only (an undertrained
# model has no mid-band AP to assert).
SMOKE = os.environ.get("SPE_VALIDATE_SMOKE") == "1"
if SMOKE:
    N_TRAIN, N_VALID = 32, 10
    WARMUP_EPOCHS, IOU_EPOCHS = 6, 6


# Hard-split stored-crop sizes (cycled): the SAME trained model is scored
# at areas from COCO-"medium" to far-"large", so APm/APl are non-degenerate
# and a fixed heatmap-space decode error costs different OKS per scale.
HARD_SIZES = (96, 128, 192, 256, 320)
N_OCCLUDED = 4  # labeled-but-invisible keypoints per hard example


def _marker_colors():
    """17 saturated, maximally-separated hues (HSV wheel): with RANDOM
    marker positions, color is the only keypoint-identity cue, so the
    palette must be unambiguous under JPEG + contrast jitter."""
    import colorsys

    return np.array([[int(255 * c) for c in
                      colorsys.hsv_to_rgb(k / 17.0, 1.0, 1.0)]
                     for k in range(17)], np.float64)


_COLORS = _marker_colors()


def _random_positions(rng, n, size, margin, min_sep):
    """n points in [margin, size-margin]^2 with pairwise separation >=
    min_sep (rejection sampling, deterministic under rng)."""
    pts = []
    while len(pts) < n:
        p = rng.uniform(margin, size - margin, 2)
        if all(np.hypot(p[0] - q[0], p[1] - q[1]) >= min_sep for q in pts):
            pts.append(p)
    return np.array(pts)


def marker_example(rng, idx, size=SIZE, hard=False):
    """A noise image with 17 color-coded markers at RANDOM positions;
    keypoints at marker centers in crop-pixel space (the record format
    the ETL emits). Includes the prediction-path metadata (ids + un-crop
    geometry): the crop IS the square bbox anchored at the origin, so
    crop coords == original-image coords and the OKS GT can share them.

    Random positions make this an appearance-based detection task (the
    translation-equivariant job a conv pose model actually does) rather
    than a memorizable grid — a position prior cannot saturate the gate.

    hard=True (the held-out split, VERDICT r4 Next #1b): N_OCCLUDED
    keypoints per example are labeled v=1 but NOT drawn — they count in
    OKS/PCK yet carry no visual evidence and their random locations are
    unpredictable, capping per-example OKS near 13/17 and pinning the
    gate in the discriminative mid-band — and the visible markers get
    extra size/contrast jitter. `size` = the stored crop resolution
    (scale spread; the input pipeline resizes to the model input)."""
    img = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
    vis = np.full(17, 2, np.int64)
    s = size / 256.0
    pos = _random_positions(rng, 17, size, margin=14 * s, min_sep=26 * s)
    kx = pos[:, 0].astype(np.float32)
    ky = pos[:, 1].astype(np.float32)
    occluded = set(rng.choice(17, N_OCCLUDED, replace=False).tolist()) \
        if hard else set()
    for k in range(17):
        x, y = int(round(kx[k])), int(round(ky[k]))
        if k in occluded:
            vis[k] = 1
            continue
        half = max(2, int(round(6 * s)))
        if hard:
            half = max(2, int(round(half * rng.uniform(0.8, 1.0))))
            contrast = rng.uniform(0.65, 1.0)
        else:
            # Train sees the same nuisance family (mild contrast jitter)
            # so the hard split is harder in DEGREE, not distribution.
            contrast = rng.uniform(0.8, 1.0)
        color = _COLORS[k] * contrast
        img[max(0, y - half):y + half + 1,
            max(0, x - half):x + half + 1] = color.astype(np.uint8)
    feats = {
        "ann_id": [1000 + idx], "image_id": [idx],
        "image": [encode_jpeg(img)],
        "width": [float(size)], "height": [float(size)],
        "bbox_x": [0.0], "bbox_y": [0.0],
        # original person bbox whose x1.25 square expansion = the crop.
        "original_bbox": [0.0, 0.0, size / 1.25, size / 1.25],
        "keypoints/x": [float(v) for v in kx],
        "keypoints/y": [float(v) for v in ky],
        "keypoints/vis": [int(v) for v in vis],
    }
    return feats, kx, ky, vis


def write_dataset():
    import json

    shutil.rmtree(ROOT, ignore_errors=True)
    rng = np.random.default_rng(0)
    for split, n in (("train", N_TRAIN), ("valid", N_VALID)):
        hard = split == "valid"
        d = os.path.join(ROOT, "tfrecords", split)
        os.makedirs(d, exist_ok=True)
        images, annotations = [], []
        with TFRecordWriter(
                os.path.join(d, f"file_{split}_00-{n}.tfrec")) as w:
            for i in range(n):
                size = HARD_SIZES[i % len(HARD_SIZES)] if hard else SIZE
                feats, kx, ky, vis = marker_example(rng, i, size=size,
                                                    hard=hard)
                w.write(example_codec.encode_example(feats))
                kps = []
                for k in range(17):
                    kps += [float(kx[k]), float(ky[k]), int(vis[k])]
                images.append({"id": i, "width": size, "height": size,
                               "file_name": f"{i:012d}.jpg"})
                annotations.append({
                    "id": 1000 + i, "image_id": i, "iscrowd": 0,
                    "bbox": [0.0, 0.0, size / 1.25, size / 1.25],
                    "area": (size / 1.25) ** 2,
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
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    write_dataset()
    cfg = Config().replace(
        dataset_dir=ROOT, temporary_dir=os.path.join(ROOT, "temp"),
        batch_size=16, checkpoint_every_epochs=25,
        async_checkpointing=False, shuffle_buffer=64)
    stacks, channels = (2, 32) if SMOKE else (4, 256)
    model = StackedHourglass(num_stacks=stacks, num_channels=channels,
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

    # Phase 3 (VERDICT r3 Next #6, recalibrated r4 Next #1): the FULL
    # evaluation protocol on the HARD held-out valid split — fused
    # predict + on-device decode + un-crop (evaluation/predict.py)
    # scored by the native COCOeval-protocol OKS and PCK. The split has
    # N_OCCLUDED labeled-but-invisible keypoints per example plus
    # scale/contrast spread, so a correct model lands in a MID-BAND AP
    # (occlusion alone caps per-example OKS near 13/17 = 0.76 -> AP
    # ~0.6 with perfect visible keypoints) instead of saturating at
    # 1.000 — the gate asserts the band, not just a floor.
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
    print(f"held-out(HARD) OKS AP {stats[0]:.3f} AP50 {stats[1]:.3f} "
          f"AP75 {stats[2]:.3f} APm {stats[3]:.3f} APl {stats[4]:.3f} "
          f"AR {stats[5]:.3f}; mean PCK@0.05 {mean_pck:.3f}", flush=True)

    # Sensitivity legs (VERDICT r4 Next #1): the instrument must DETECT
    # the bug classes it exists to catch, by the amount the independent
    # brute-force oracle predicts from the same perturbed predictions.
    sens = sensitivity_legs(preds, stats, cfg)

    # Decode-variant delta, recorded while at it: legacy (reference
    # bug-for-bug, the default above) vs corrected quarter-pixel decode.
    preds_c = predict_ds(model, state,
                         DatasetBuilder(cfg).get_ds_prediction(),
                         conf_threshold=0.05, legacy_decode=False,
                         save_path=None)
    ap_corrected = float(eval_oks(preds_c, cfg.valid_annot_file,
                                  verbose=False)[0])
    print(f"decode variant: legacy AP {stats[0]:.3f} vs corrected AP "
          f"{ap_corrected:.3f} (delta {ap_corrected - stats[0]:+.3f})",
          flush=True)

    band_ok = (0.25 <= stats[0] <= 0.90     # mid-band, NOT saturated
               and stats[0] < 0.999
               and stats[1] >= 0.70          # visible keypoints ARE found
               and 0.45 <= mean_pck <= 0.97)
    if SMOKE:
        # Plumbing-only gate: the protocol ran end to end and both OKS
        # implementations agree on every (un)perturbed prediction set.
        print(f"[smoke] band_ok={band_ok} sens={sens} (report-only)",
              flush=True)
        ok = last_iou < first_iou and len(preds) == N_VALID
    else:
        ok = (last_iou < first_iou * 0.8 and err.mean() < 2.0
              and band_ok and sens)
    print("VALIDATE_TRAIN_IOU_TPU:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


def sensitivity_legs(preds, base_stats, cfg) -> bool:
    """Perturb the model's own predictions two ways a real decode bug
    would and assert the gate moves by the oracle-predicted amount:

      * +1 heatmap px (= 1/64 of the crop) systematic x-bias — the
        decode-v2 class of bug; must cost AP measurably.
      * left/right flip-pair swap — the broken-flip-table bug; must
        crater AP.

    Each perturbed set is scored by BOTH evaluation.oks.eval_oks and the
    independent brute-force oracle (tests/oracle_cocoeval.py) on
    identical detections; the two must agree to 1e-9, making the
    measured delta a PREDICTED delta, not a coincidence of one
    implementation."""
    import copy
    import json

    from single_person_pose_estimation_tpu.evaluation.oks import eval_oks

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    import oracle_cocoeval

    with open(cfg.valid_annot_file) as f:
        gt = json.load(f)

    def oracle_stats(pred_list):
        dets = []
        for p in pred_list:
            kps = []
            for x, y in zip(p["xs/pred"], p["ys/pred"]):
                kps += [int(x), int(y), 1]
            dets.append({"image_id": int(p["image_id"]), "keypoints": kps,
                         "score": float(np.mean(p["confs"]))})
        img_ids = sorted({d["image_id"] for d in dets})
        return np.asarray(oracle_cocoeval.evaluate(
            gt["annotations"], dets, img_ids))

    base_ap = float(base_stats[0])
    agree = np.allclose(np.asarray(base_stats), oracle_stats(preds),
                        atol=1e-9)
    print(f"oracle agreement (unperturbed): {agree}", flush=True)

    # Leg 1: +1 heatmap-pixel x-bias, scaled per example to its stored
    # crop (bbox_w / 64 original px).
    biased = copy.deepcopy(preds)
    for p in biased:
        step = float(p["original_bbox"][2]) * 1.25 / 64.0
        p["xs/pred"] = [x + step for x in p["xs/pred"]]
    ap_biased = float(eval_oks(biased, cfg.valid_annot_file,
                               verbose=False)[0])
    oracle_biased = float(oracle_stats(biased)[0])
    bias_agree = abs(ap_biased - oracle_biased) < 1e-9
    bias_detected = base_ap - ap_biased >= 0.02
    print(f"sensitivity[1px-bias]: AP {base_ap:.3f} -> {ap_biased:.3f} "
          f"(delta {ap_biased - base_ap:+.3f}, oracle {oracle_biased:.3f},"
          f" agree={bias_agree}, detected={bias_detected})", flush=True)

    # Leg 2: left/right flip-pair swap of the predictions.
    swapped = copy.deepcopy(preds)
    for p in swapped:
        xs, ys = list(p["xs/pred"]), list(p["ys/pred"])
        for a, b in cfg.flip_pairs:
            xs[a], xs[b] = xs[b], xs[a]
            ys[a], ys[b] = ys[b], ys[a]
        p["xs/pred"], p["ys/pred"] = xs, ys
    ap_swapped = float(eval_oks(swapped, cfg.valid_annot_file,
                                verbose=False)[0])
    oracle_swapped = float(oracle_stats(swapped)[0])
    swap_agree = abs(ap_swapped - oracle_swapped) < 1e-9
    swap_detected = base_ap - ap_swapped >= 0.10
    print(f"sensitivity[flip-swap]: AP {base_ap:.3f} -> {ap_swapped:.3f} "
          f"(delta {ap_swapped - base_ap:+.3f}, oracle "
          f"{oracle_swapped:.3f}, agree={swap_agree}, "
          f"detected={swap_detected})", flush=True)
    return bool(agree and bias_agree and bias_detected
                and swap_agree and swap_detected)


if __name__ == "__main__":
    main()
