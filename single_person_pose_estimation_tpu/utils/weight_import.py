"""TF/Keras -> JAX weight import for bit-parity with the reference model.

The reference publishes Keras weights (S4_E120_Adam_IOU etc.); importing
them into the flax StackedHourglass enables (a) the atol-1e-4 heatmap
parity check against the TF implementation and (b) reproducing the
published COCO numbers without retraining (SURVEY.md §6, hard part (e)).

Mapping rules (models/hourglass.py mirrors reference layer names exactly):
  * Conv2D `name`            -> params[name] {kernel (H,W,I,O), bias} —
                                identical layouts, no transpose needed;
  * SeparableConv2D `name`   -> params[name]{depthwise{kernel}, pointwise
                                {kernel, bias}}; Keras depthwise kernel is
                                (k, k, C, 1) vs flax's (k, k, 1, C);
  * BatchNormalization       -> named `<preceding conv>_bn` here; Keras
                                auto-names them, but each BN directly
                                follows its conv in layer-creation order,
                                so pairing by order is exact;
  * gamma/beta               -> params[bn]{scale, bias};
    moving mean/variance     -> batch_stats[bn]{mean, var}.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _producing_layer(tensor):
    """The layer that produced `tensor` (Keras 2 and 3 compatible)."""
    hist = tensor._keras_history
    op = getattr(hist, "operation", None)
    if op is not None:
        return op
    return hist[0]


def keras_to_flax_variables(keras_model) -> Dict[str, Any]:
    """Convert a Keras hourglass (reference architecture + naming) into
    flax variables {"params": ..., "batch_stats": ...} for
    models.hourglass.StackedHourglass.

    Each BatchNormalization is paired with the conv that PRODUCES ITS INPUT
    (graph edge, not layer-list order — Keras' topological layer ordering
    interleaves bottleneck skip convs between a conv and its BN)."""
    import jax.numpy as jnp

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for layer in keras_model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            kernel, bias = layer.get_weights()
            params[layer.name] = {"kernel": jnp.asarray(kernel),
                                  "bias": jnp.asarray(bias)}
        elif cls == "SeparableConv2D":
            dw, pw, bias = layer.get_weights()
            params[layer.name] = {
                "depthwise": {"kernel": jnp.asarray(
                    np.transpose(dw, (0, 1, 3, 2)))},
                "pointwise": {"kernel": jnp.asarray(pw),
                              "bias": jnp.asarray(bias)},
            }
        elif cls == "BatchNormalization":
            src = _producing_layer(layer.input)
            if type(src).__name__ not in ("Conv2D", "SeparableConv2D"):
                raise ValueError(
                    f"BN {layer.name} input produced by {src.name!r}, "
                    "expected a conv")
            gamma, beta, mean, var = layer.get_weights()
            bn = src.name + "_bn"
            params[bn] = {"scale": jnp.asarray(gamma),
                          "bias": jnp.asarray(beta)}
            batch_stats[bn] = {"mean": jnp.asarray(mean),
                               "var": jnp.asarray(var)}
    return {"params": params, "batch_stats": batch_stats}


def flax_to_keras_weights(variables: Dict[str, Any], keras_model) -> None:
    """Write flax variables back into a Keras model (inverse mapping) —
    used to export trained JAX weights for TF serving parity."""
    params = variables["params"]
    stats = variables["batch_stats"]
    for layer in keras_model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            p = params[layer.name]
            layer.set_weights([np.asarray(p["kernel"]), np.asarray(p["bias"])])
        elif cls == "SeparableConv2D":
            p = params[layer.name]
            layer.set_weights([
                np.transpose(np.asarray(p["depthwise"]["kernel"]),
                             (0, 1, 3, 2)),
                np.asarray(p["pointwise"]["kernel"]),
                np.asarray(p["pointwise"]["bias"]),
            ])
        elif cls == "BatchNormalization":
            bn = _producing_layer(layer.input).name + "_bn"
            layer.set_weights([
                np.asarray(params[bn]["scale"]),
                np.asarray(params[bn]["bias"]),
                np.asarray(stats[bn]["mean"]),
                np.asarray(stats[bn]["var"]),
            ])


def validate_import(variables: Dict[str, Any], flax_model,
                    input_shape=(1, 256, 256, 3)) -> Tuple[bool, str]:
    """Sanity-check imported variables initialize/apply cleanly and every
    expected parameter was filled."""
    import jax
    import jax.numpy as jnp

    ref = flax_model.init(jax.random.PRNGKey(0),
                          jnp.zeros(input_shape), train=False)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(ref)[0]}

    def flatten(tree):
        return {"/".join(str(getattr(k, "key", k)) for k in path): v.shape
                for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    got_flat = flatten(variables)
    ref_flat2 = flatten(ref)
    missing = set(ref_flat2) - set(got_flat)
    extra = set(got_flat) - set(ref_flat2)
    mismatched = {k for k in set(got_flat) & set(ref_flat2)
                  if got_flat[k] != ref_flat2[k]}
    if missing or extra or mismatched:
        return False, (f"missing={sorted(missing)[:5]} "
                       f"extra={sorted(extra)[:5]} "
                       f"shape-mismatch={sorted(mismatched)[:5]}")
    return True, "ok"
