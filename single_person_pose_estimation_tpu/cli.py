"""Command-line entry points.

The reference has no CLI — every workflow is a notebook (README.md:14:
"argparse has not been supported yet"; Train.ipynb / evaluation.ipynb /
demo.ipynb / gen_tfrecords.ipynb are the entry points, SURVEY.md C16).
This module provides the equivalent operations as subcommands:

    python -m single_person_pose_estimation_tpu.cli gen-records [...]
    python -m single_person_pose_estimation_tpu.cli train [...]
    python -m single_person_pose_estimation_tpu.cli resume [...]
    python -m single_person_pose_estimation_tpu.cli eval [...]
    python -m single_person_pose_estimation_tpu.cli export [...]
    python -m single_person_pose_estimation_tpu.cli serve [...]
    python -m single_person_pose_estimation_tpu.cli bench [...]

Any Config field can be overridden with --set field=value.
"""

from __future__ import annotations

import argparse
import json
import sys

from single_person_pose_estimation_tpu.configs.default_config import Config


def _apply_overrides(cfg: Config, overrides) -> Config:
    for item in overrides or []:
        key, _, value = item.partition("=")
        if not hasattr(cfg, key):
            raise SystemExit(f"unknown config field: {key}")
        current = getattr(cfg, key)
        if isinstance(current, bool):
            parsed = value.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            parsed = int(value)
        elif isinstance(current, float):
            parsed = float(value)
        else:
            parsed = value
        cfg = cfg.replace(**{key: parsed})
    return cfg


def _build_model(cfg: Config):
    from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
    import jax.numpy as jnp

    import jax

    if cfg.front_s2d not in ("auto", "on", "off"):
        raise ValueError(f"front_s2d must be auto/on/off: {cfg.front_s2d!r}")
    even = cfg.image_height % 2 == 0 and cfg.image_width % 2 == 0
    if cfg.front_s2d == "on" and not even:
        raise ValueError(
            "front_s2d needs even image dimensions (the 2x2 space-to-depth "
            f"blocking), got {cfg.image_height}x{cfg.image_width}")
    front_s2d = (cfg.front_s2d == "on"
                 or (cfg.front_s2d == "auto" and even
                     and jax.default_backend() == "tpu"))
    return StackedHourglass(
        num_classes=cfg.num_keypoints,
        num_stacks=cfg.hg_num_stacks,
        num_channels=cfg.hg_num_channels,
        predict_activation=cfg.hm_activation,
        mobile=cfg.mobile,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32,
        front_s2d=front_s2d,
    )


def cmd_gen_records(args, cfg: Config):
    from single_person_pose_estimation_tpu.data import coco

    coco.gen_trainval_records(cfg, drop_min_num_kps=not args.keep_sparse)


def _make_trainer(args, cfg: Config):
    from single_person_pose_estimation_tpu.data.pipeline import DatasetBuilder
    from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib
    from single_person_pose_estimation_tpu.training.trainer import Trainer
    import jax

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        mesh = mesh_lib.create_mesh((-1,), ("data",))
    model = _build_model(cfg)
    builder = DatasetBuilder(cfg, ratio=args.ratio)
    return Trainer(model, builder, args.epochs, args.lr, args.loss, cfg,
                   mesh=mesh, augment=not args.no_augment,
                   bn_mode="frozen" if args.freeze_bn else "batch",
                   accum_steps=args.accum_steps,
                   lr_schedule=args.lr_schedule,
                   warmup_steps=args.warmup_steps,
                   ema_decay=args.ema_decay)


def cmd_train(args, cfg: Config):
    trainer = _make_trainer(args, cfg)
    trainer.train()
    trainer.close()


def cmd_resume(args, cfg: Config):
    trainer = _make_trainer(args, cfg)
    trainer.resume_training()
    trainer.close()


def _maybe_ema_params(state, args, what: str):
    """Swap the Polyak-averaged params in when --ema was passed.

    The meta-aware loader already rebuilt the EMA opt_state component
    from the checkpoint's meta; get_ema_params raises clearly for
    checkpoints trained without --ema-decay."""
    if not getattr(args, "ema", False):
        return state
    from single_person_pose_estimation_tpu.training import steps

    state = state.replace(params=steps.get_ema_params(state.opt_state))
    print(f"{what} the Polyak-averaged (EMA) params")
    return state


def cmd_eval(args, cfg: Config):
    from single_person_pose_estimation_tpu.configs.default_config import (
        COCO_KEYPOINT_LABELS,
    )
    from single_person_pose_estimation_tpu.data.pipeline import DatasetBuilder
    from single_person_pose_estimation_tpu.evaluation.oks import eval_oks
    from single_person_pose_estimation_tpu.evaluation.pck import eval_pck
    from single_person_pose_estimation_tpu.evaluation.predict import predict_ds
    from single_person_pose_estimation_tpu.utils.model_utils import (
        load_model_from_checkpoint,
    )

    if args.report:
        # Fail before the (long) evaluation, not after it when the report
        # writer first imports matplotlib.
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            raise SystemExit(
                "--report needs matplotlib (pip install "
                "'single-person-pose-estimation-tpu[report]')")
    model = _build_model(cfg)
    state, meta = load_model_from_checkpoint(
        model, cfg.checkpoints_path, best=not args.latest,
        input_shape=(1, cfg.image_height, cfg.image_width, 3))
    print(f"Loaded checkpoint meta: {meta}")
    state = _maybe_ema_params(state, args, "Evaluating")
    builder = DatasetBuilder(cfg, ratio=args.ratio)
    if args.recalibrate_batches:
        # BN running stats (Keras momentum .99) take ~1e4 steps to converge;
        # after short trainings eval-mode outputs are unusable without a
        # recalibration pass over train batches (training/steps.py).
        from single_person_pose_estimation_tpu.training.steps import (
            recalibrate_batch_stats,
        )
        train_it, _ = builder.build_datasets()
        n = args.recalibrate_batches
        momentum = 0.0 if n == 1 else 1.0 - 1.0 / n
        state = recalibrate_batch_stats(
            model, state, (next(train_it) for _ in range(n)),
            momentum=momentum)
        print(f"Recalibrated BN stats over {n} train batches")
    import jax

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from single_person_pose_estimation_tpu.parallel import (
            mesh as mesh_lib,
        )
        mesh = mesh_lib.create_mesh((-1,), ("data",))
    preds = predict_ds(model, state, builder.get_ds_prediction(),
                       conf_threshold=args.conf_threshold,
                       legacy_decode=cfg.legacy_decode,
                       save_path=args.save_path,
                       flip_test=args.flip_test,
                       flip_pairs=cfg.flip_pairs,
                       mesh=mesh)
    print(f"{len(preds)} predictions -> {args.save_path}")
    stats = None
    if args.gt:
        stats = eval_oks(preds, args.gt)
        print("OKS stats:", [round(float(s), 3) for s in stats])
    pck = eval_pck(preds, COCO_KEYPOINT_LABELS,
                   pck_threshold=args.pck_threshold)
    if args.report:
        from single_person_pose_estimation_tpu.utils.reporting import (
            save_eval_report,
        )
        paths = save_eval_report(args.report, pck, COCO_KEYPOINT_LABELS,
                                 oks_stats=stats,
                                 pck_threshold=args.pck_threshold)
        print("Report written:", ", ".join(paths))


def cmd_serve(args, cfg: Config):
    """Serve pose estimation: over HTTP (--http PORT: POST /predict with
    image bytes, GET /healthz, GET /stats — serving_http.HttpPoseService)
    or as a one-shot batch over a directory of images."""
    import glob as globlib

    import numpy as np

    from single_person_pose_estimation_tpu.serving import PoseServer
    from single_person_pose_estimation_tpu.utils.model_utils import (
        load_model_from_checkpoint,
    )

    if args.http is None and not args.images:
        raise SystemExit("pass --images GLOB or --http PORT")
    model = _build_model(cfg)
    state, meta = load_model_from_checkpoint(
        model, cfg.checkpoints_path, best=not args.latest,
        input_shape=(1, cfg.image_height, cfg.image_width, 3))
    print(f"Loaded checkpoint meta: {meta}")
    state = _maybe_ema_params(state, args, "Serving")
    server = PoseServer(model, state.params, state.batch_stats,
                        buckets=tuple(args.buckets),
                        transfer_dtype=args.transfer_dtype)
    server.warmup(image_shape=(cfg.image_height, cfg.image_width, 3))
    if args.http is not None:
        from single_person_pose_estimation_tpu.serving_http import (
            HttpPoseService,
        )

        svc = HttpPoseService(
            server, input_size=(cfg.image_height, cfg.image_width))
        port = svc.start(host=args.host, port=args.http)
        print(f"Serving on http://{args.host}:{port} "
              "(POST /predict, GET /healthz, GET /stats); Ctrl-C to stop")
        try:
            import signal

            signal.pause()
        except KeyboardInterrupt:
            pass
        finally:
            svc.close()
            server.close()
        return
    paths = sorted(globlib.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images!r}")
    from single_person_pose_estimation_tpu.data.images import (
        read_image, resize_bilinear,
    )

    futures = {}
    for path in paths:
        img = read_image(path).astype(np.float32) / 255.0
        img = resize_bilinear(img, (cfg.image_height, cfg.image_width))
        futures[path] = server.submit(img)
    records = {}
    for path, fut in futures.items():
        kps = np.asarray(fut.result())
        records[path] = kps.tolist()
    stats = server.stats()
    server.close()
    import json

    with open(args.save_path, "w") as f:
        json.dump(records, f)
    print(f"{len(records)} images -> {args.save_path}; "
          f"p50 {stats['latency_p50_ms']:.1f} ms, "
          f"avg batch {stats['avg_batch']:.1f}")


def cmd_export(args, cfg: Config):
    """Deployment export (save_model.ipynb parity + TFLite for edge):
    checkpoint -> Orbax inference artifact / TF SavedModel / TFLite."""
    from single_person_pose_estimation_tpu.utils import export as export_lib
    from single_person_pose_estimation_tpu.utils.model_utils import (
        load_model_from_checkpoint,
    )

    if not (args.artifact or args.savedmodel or args.tflite):
        # Validate before the model build + checkpoint restore (minutes
        # through a remote-TPU tunnel), not after.
        raise SystemExit(
            "nothing to do: pass --artifact, --savedmodel, and/or --tflite")
    model = _build_model(cfg)
    state, meta = load_model_from_checkpoint(
        model, cfg.checkpoints_path, best=not args.latest,
        input_shape=(1, cfg.image_height, cfg.image_width, 3))
    print(f"Loaded checkpoint meta: {meta}")
    state = _maybe_ema_params(state, args, "Exporting")
    wrote = []
    if args.artifact:
        export_lib.save_inference_artifact(cfg, state.params,
                                           state.batch_stats, args.artifact)
        wrote.append(args.artifact)
    if args.savedmodel:
        export_lib.export_savedmodel(cfg, state.params, state.batch_stats,
                                     args.savedmodel,
                                     batch_size=args.batch_size)
        wrote.append(args.savedmodel)
    if args.tflite:
        size = export_lib.export_tflite(
            cfg, state.params, state.batch_stats, args.tflite,
            batch_size=args.batch_size or 1, quantize=args.quantize)
        wrote.append(f"{args.tflite} ({size} bytes)")
    print("Exported:", ", ".join(wrote))


def cmd_bench(args, cfg: Config):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")


def main(argv=None):
    p = argparse.ArgumentParser(prog="single_person_pose_estimation_tpu")
    p.add_argument("--set", action="append", dest="overrides", default=[],
                   metavar="FIELD=VALUE", help="override a Config field")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-records", help="COCO json -> record shards ETL")
    g.add_argument("--keep-sparse", action="store_true",
                   help="keep people with < MIN_NUM_KEYPOINTS keypoints")
    g.set_defaults(fn=cmd_gen_records)

    for name, fn in (("train", cmd_train), ("resume", cmd_resume)):
        t = sub.add_parser(name)
        t.add_argument("--epochs", type=int, default=10)
        t.add_argument("--lr", type=float, default=1e-3)
        t.add_argument("--loss", default="iou",
                       choices=["mse", "weighted_mse", "iou",
                                "weighted_keypoint_mse"])
        t.add_argument("--ratio", type=float, default=1.0)
        t.add_argument("--data-parallel", action="store_true", default=True)
        t.add_argument("--no-augment", action="store_true",
                       help="disable on-device train augmentation")
        t.add_argument("--freeze-bn", action="store_true",
                       help="fine-tuning: normalize with frozen running "
                            "BN statistics (4.2%% faster; do not use "
                            "from-scratch)")
        t.add_argument("--accum-steps", type=int, default=1,
                       help="gradient accumulation: N microbatches per "
                            "optimizer step (activation memory scales "
                            "with batch/N)")
        t.add_argument("--lr-schedule", default=None,
                       choices=["constant", "cosine"],
                       help="lr schedule (default: constant, reference "
                            "semantics)")
        t.add_argument("--warmup-steps", type=int, default=0,
                       help="linear lr warmup steps")
        t.add_argument("--ema-decay", type=float, default=None,
                       help="track a Polyak EMA of params in the "
                            "optimizer state (e.g. 0.999)")
        t.set_defaults(fn=fn)

    e = sub.add_parser("eval")
    e.add_argument("--gt", default=None,
                   help="COCO GT json for OKS (default: PCK only)")
    e.add_argument("--conf-threshold", type=float, default=0.1)
    e.add_argument("--pck-threshold", type=float, default=0.05)
    e.add_argument("--ratio", type=float, default=1.0)
    e.add_argument("--latest", action="store_true",
                   help="evaluate the latest instead of the best checkpoint")
    e.add_argument("--recalibrate-batches", type=int, default=0,
                   help="refresh BN running stats over N train batches "
                        "before predicting (needed after short trainings)")
    e.add_argument("--save-path", default="result.json")
    e.add_argument("--ema", action="store_true",
                   help="evaluate the Polyak-averaged params (checkpoint "
                        "must come from train --ema-decay)")
    e.add_argument("--flip-test", action="store_true",
                   help="test-time augmentation: average heatmaps with the "
                        "horizontally mirrored input (left/right channels "
                        "swapped back); ~2x forward cost per image")
    e.add_argument("--data-parallel", action="store_true", default=True,
                   help="shard eval batches over all devices' 'data' mesh "
                        "axis (on by default; no-op on one device)")
    e.add_argument("--report", default=None, metavar="PREFIX",
                   help="write PREFIX.md + PCK/OKS figures (the artifacts "
                        "the reference publishes as README screenshots)")
    e.set_defaults(fn=cmd_eval)

    x = sub.add_parser("export", help="checkpoint -> deployment artifacts")
    x.add_argument("--artifact", default=None, metavar="DIR",
                   help="write an Orbax inference artifact (JAX-native)")
    x.add_argument("--savedmodel", default=None, metavar="DIR",
                   help="write a TF SavedModel via jax2tf")
    x.add_argument("--tflite", default=None, metavar="FILE",
                   help="write a TFLite flatbuffer (edge deployment; "
                        "pairs with --set mobile=true)")
    x.add_argument("--batch-size", type=int, default=None,
                   help="static batch size; omit for a polymorphic-batch "
                        "SavedModel (TFLite always needs one and "
                        "defaults to 1)")
    x.add_argument("--quantize", default=None,
                   choices=["dynamic", "float16"],
                   help="TFLite quantization (int8 calibration is "
                        "library-only: utils.export.export_tflite)")
    x.add_argument("--latest", action="store_true",
                   help="export the latest instead of the best checkpoint")
    x.add_argument("--ema", action="store_true",
                   help="export the Polyak-averaged params (checkpoint "
                        "must come from train --ema-decay)")
    x.set_defaults(fn=cmd_export)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    sv = sub.add_parser("serve",
                        help="serve over HTTP or over an image glob")
    sv.add_argument("--images", default=None,
                    help="glob of image files for one-shot batch serving")
    sv.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve over HTTP instead (0 = ephemeral port): "
                         "POST /predict, GET /healthz, GET /stats")
    sv.add_argument("--host", default="127.0.0.1",
                    help="HTTP bind address (default loopback)")
    sv.add_argument("--save-path", default="keypoints.json")
    sv.add_argument("--latest", action="store_true")
    sv.add_argument("--ema", action="store_true",
                    help="serve the Polyak-averaged params (checkpoint "
                         "must come from train --ema-decay)")
    sv.add_argument("--buckets", type=int, nargs="+", default=[1, 4, 16])
    sv.add_argument("--transfer-dtype", default="uint8",
                    choices=["uint8", "bfloat16", "float32"])
    sv.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    cfg = _apply_overrides(Config(), args.overrides)
    args.fn(args, cfg)


if __name__ == "__main__":
    main()
