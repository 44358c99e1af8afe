"""Deployment export: self-contained inference artifacts.

Reference equivalent: save_model.ipynb (C16) exports a Keras SavedModel
from a weights checkpoint (weights ckpt -> SavedModel, cells 3-5). Here the
primary artifact is JAX-native — an Orbax checkpoint of
{params, batch_stats} plus the model config, reloadable into a jitted
inference function with nothing but this package — and a TF SavedModel can
additionally be produced through jax2tf for serving-stack parity (optional:
only if TensorFlow is importable; the framework itself never requires TF).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass


def _model_from_config(cfg: Config) -> StackedHourglass:
    return StackedHourglass(
        num_classes=cfg.num_keypoints,
        num_stacks=cfg.hg_num_stacks,
        num_channels=cfg.hg_num_channels,
        predict_activation=cfg.hm_activation,
        mobile=cfg.mobile,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32,
    )


def save_inference_artifact(cfg: Config, params: Any, batch_stats: Any,
                            path: str) -> None:
    """Write <path>/{config.json, variables/} — everything needed to serve."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "variables"),
               {"params": params, "batch_stats": batch_stats})
    ckptr.wait_until_finished()
    ckptr.close()


def load_inference_artifact(path: str) -> Tuple[StackedHourglass, Dict, Callable]:
    """Load an artifact -> (model, variables, jitted predict fn).

    The predict fn maps (B, H, W, 3) float images in [0, 1] to the LAST
    stack's heatmaps (the inference output, eval.py:108 convention).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = Config.from_json(f.read())
    model = _model_from_config(cfg)
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.image_height, cfg.image_width, 3)),
                           train=False))
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.join(path, "variables"), abstract)
    ckptr.close()

    @jax.jit
    def predict(images):
        return model.apply(variables, images, train=False)[-1]

    return model, variables, predict


def _tf_infer_fn(cfg: Config, params: Any, batch_stats: Any, caller: str):
    """Shared TF-export scaffolding: import TF/jax2tf (call-time-only
    dependency) and build the (B, H, W, 3) float -> last-stack-heatmaps
    inference closure every exported artifact wraps."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            f"{caller} requires tensorflow + jax2tf installed") from e

    model = _model_from_config(cfg)
    variables = {"params": params, "batch_stats": batch_stats}

    def infer(images):
        return model.apply(variables, images, train=False)[-1]

    return tf, jax2tf, infer


def export_savedmodel(cfg: Config, params: Any, batch_stats: Any,
                      path: str, batch_size: Optional[int] = None) -> None:
    """jax2tf the inference fn into a TF SavedModel (save_model.ipynb
    parity for TF-serving stacks). Requires TensorFlow at call time only.

    batch_size None -> polymorphic batch dimension.
    """
    tf, jax2tf, infer = _tf_infer_fn(cfg, params, batch_stats,
                                     "export_savedmodel")
    poly = None if batch_size is not None else "(b, ...)"
    tf_fn = tf.function(
        jax2tf.convert(infer, polymorphic_shapes=[poly] if poly else None),
        autograph=False,
        input_signature=[tf.TensorSpec(
            [batch_size, cfg.image_height, cfg.image_width, 3], tf.float32)],
    )
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, path)


def export_tflite(cfg: Config, params: Any, batch_stats: Any, path: str,
                  batch_size: int = 1, quantize: Optional[str] = None,
                  representative_images: Any = None) -> int:
    """Export the inference fn as a TFLite flatbuffer for edge deployment.

    The natural companion of the mobile (separable-conv) variant — the
    reference ships `mobile=True` (hourglass.py:209-231) precisely for
    edge targets but provides no on-device export; this closes that loop
    (save_model.ipynb exports a server-side SavedModel only). Output maps
    (B, H, W, 3) float images in [0, 1] to the LAST stack's heatmaps.

    quantize:
      None      — float32 weights and compute.
      "dynamic" — dynamic-range quantization (int8 weights, float compute;
                  ~4x smaller, no calibration data needed).
      "float16" — fp16 weights (GPU-delegate friendly).
      "int8"    — full-integer weights+activations; requires
                  `representative_images`, an iterable of (B, H, W, 3)
                  float arrays in [0, 1] used for activation calibration.
                  Input/output tensors stay float (quantize/dequantize at
                  the boundary) so callers keep the same interface.

    Returns the flatbuffer size in bytes. Requires TensorFlow at call
    time only. Conversion goes through jax2tf graph serialization
    (native_serialization=False): TFLite consumes plain TF ops, not the
    XlaCallModule custom call that native serialization emits.
    """
    import warnings

    if quantize not in (None, "dynamic", "float16", "int8"):
        raise ValueError(
            f"quantize must be None, 'dynamic', 'float16', or 'int8'; "
            f"got {quantize!r}")
    if quantize == "int8" and representative_images is None:
        raise ValueError(
            "quantize='int8' needs representative_images for calibration")
    tf, jax2tf, infer = _tf_infer_fn(cfg, params, batch_stats,
                                     "export_tflite")
    with warnings.catch_warnings():
        # Graph serialization is deprecated in jax2tf but is the only
        # lowering TFLite's converter accepts (see docstring).
        warnings.simplefilter("ignore", DeprecationWarning)
        tf_fn = tf.function(
            jax2tf.convert(infer, native_serialization=False),
            autograph=False,
            input_signature=[tf.TensorSpec(
                [batch_size, cfg.image_height, cfg.image_width, 3],
                tf.float32)])
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()], tf_fn)
    if quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize == "float16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    elif quantize == "int8":
        import numpy as np

        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = lambda: (
            [np.asarray(img, np.float32)] for img in representative_images)
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    blob = converter.convert()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)
