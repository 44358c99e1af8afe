"""Heatmap losses with intermediate supervision across hourglass stacks.

Reference: loss.py:2-36 plus the dispatch in trainer.py:224-245. Each loss
takes (y_true, y_pred) of shape (B, H, W, K) and returns the per-element
loss with the last axis reduced, exactly as the reference's Keras loss fns
do; `total_loss` then averages each stack's map and sums across stacks —
the same reduction Keras applies to a multi-output model with one loss
(per-output mean, outputs summed), i.e. intermediate supervision.

All functions are pure jnp and differentiate/jit cleanly.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax.numpy as jnp

# Keras backend epsilon, used by the reference's IOU loss (loss.py:24).
_EPSILON = 1e-7


def mse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE reduced over the keypoint axis (tf.keras.losses.mean_squared_error)."""
    return jnp.mean(jnp.square(y_true - y_pred), axis=-1)


def weighted_mse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Pixels inside a Gaussian blob weigh 82x (81 + 1); background weighs 1.

    Reference: loss.py:2-21 — weights = cast(y_true > 0) * 81 + 1.
    """
    weights = (y_true > 0).astype(jnp.float32) * 81.0 + 1.0
    return jnp.mean(jnp.square(y_true - y_pred) * weights, axis=-1)


def iou(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU over spatial dims per keypoint channel; 1 - mean IoU.

    Reference: loss.py:23-28 (the loss used for the published best model).
    Returns shape (B,).
    """
    inter = jnp.sum(y_true * y_pred, axis=(-3, -2))
    union = (jnp.sum(y_true * y_true, axis=(-3, -2))
             + jnp.sum(y_pred * y_pred, axis=(-3, -2)) - inter)
    iou_val = (inter + _EPSILON) / (union + _EPSILON)
    return 1.0 - jnp.mean(iou_val, axis=-1)


def weighted_keypoint_mse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """MSE masking out channels whose GT heatmap is empty (invisible keypoints).

    Reference: loss.py:30-36.
    """
    heatmap_sum = jnp.sum(y_true, axis=(-3, -2), keepdims=True)
    keypoint_weights = 1.0 - (heatmap_sum == 0.0).astype(jnp.float32)
    return jnp.mean(jnp.square(y_true - y_pred) * keypoint_weights, axis=-1)


LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

_REGISTRY: Dict[str, LossFn] = {
    "weighted_mse": weighted_mse,
    "weight_mean_squared_error": weighted_mse,
    "mse": mse,
    "mean_squared_error": mse,
    "iou": iou,
    "weighted_keypoint_mse": weighted_keypoint_mse,
}


def get_loss_from_string(loss_str: str) -> LossFn:
    """String -> loss fn dispatch, mirroring Trainer.get_loss_from_string
    (trainer.py:224-245) but raising on unknown names instead of returning None."""
    key = loss_str.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"Unknown loss '{loss_str}'. Available: {sorted(set(_REGISTRY))}")
    return _REGISTRY[key]


def per_stack_losses(loss_fn: LossFn, y_true: jnp.ndarray,
                     stack_outputs: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Scalar loss per stack output (Keras per-output mean reduction)."""
    return [jnp.mean(loss_fn(y_true, y_pred)) for y_pred in stack_outputs]


def total_loss(loss_fn: LossFn, y_true: jnp.ndarray,
               stack_outputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Intermediate supervision: sum of per-stack mean losses.

    Matches Keras `fit` on a multi-output model with a single loss fn
    (trainer.py:35: the loss applies to every stack head and the totals sum).
    """
    losses = per_stack_losses(loss_fn, y_true, stack_outputs)
    return jnp.sum(jnp.stack(losses))
