"""Checkpoint discovery / model-loading helpers.

Reference utilities/model_utils.py (C14): `compile_model_from_checkpoint`
(load weights + compile, lines 5-21) and `get_epochs_from_ckpt_path`
(enumerate every saved checkpoint + the best one for sweep evaluation,
lines 23-44). Orbax equivalents: a checkpoint is a (state, meta) pair
under <ckpt_dir>/latest/<epoch>/ or <ckpt_dir>/best/0/.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax

from single_person_pose_estimation_tpu.training import steps as steps_lib
from single_person_pose_estimation_tpu.training.checkpoint import CheckpointManager


def load_model_from_checkpoint(model, ckpt_dir: str,
                               epoch: Optional[int] = None,
                               best: bool = False,
                               learning_rate: float = 1e-3,
                               input_shape=(1, 256, 256, 3),
                               ema_decay: Optional[float] = None):
    """Build a TrainState for `model` and restore it from `ckpt_dir`.

    best=True restores the best-val-loss checkpoint; otherwise `epoch`
    (default latest). Returns (state, meta). The reference analog loads
    weights then compiles (model_utils.py:5-21); here the optimizer state
    comes back too.

    The optimizer extras a Trainer used (lr schedule, warmup, EMA) shape
    the opt_state tree; the checkpoint's meta records them, so this reads
    the meta FIRST and builds a structurally matching abstract state —
    checkpoints from any Trainer configuration load without the caller
    knowing how they were trained. `ema_decay` overrides the meta (for
    pre-meta checkpoints trained with EMA); the value only matters for
    structure, not numerics.
    """
    mgr = CheckpointManager(ckpt_dir, async_checkpointing=False)
    try:
        meta0 = mgr.read_meta(epoch=epoch, best=best) or {}
        if ema_decay is None:
            ema_decay = meta0.get("ema_decay")
        tx = steps_lib.make_optimizer(
            learning_rate,
            schedule=meta0.get("lr_schedule"),
            # any positive count yields the same ScaleByScheduleState
            # structure; the restored values overwrite it.
            total_steps=(meta0.get("warmup_steps", 0) or 0) + 1,
            warmup_steps=meta0.get("warmup_steps", 0) or 0,
            ema_decay=ema_decay)
        abstract = steps_lib.TrainState.create(
            model, tx, jax.random.PRNGKey(0), input_shape=input_shape)
        if best:
            return mgr.restore_best(abstract)
        return mgr.restore(abstract, epoch=epoch)
    finally:
        mgr.close()


def list_checkpoints(ckpt_dir: str) -> Tuple[List[int], bool]:
    """(available epochs sorted ascending, best-exists) — the sweep-eval
    enumeration of the reference's get_epochs_from_ckpt_path
    (model_utils.py:23-44)."""
    epochs: List[int] = []
    latest_dir = os.path.join(ckpt_dir, "latest")
    if os.path.isdir(latest_dir):
        for name in os.listdir(latest_dir):
            if name.isdigit():
                epochs.append(int(name))
    best = os.path.isdir(os.path.join(ckpt_dir, "best", "0"))
    return sorted(epochs), best
