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
                               input_shape=(1, 256, 256, 3)):
    """Build a TrainState for `model` and restore it from `ckpt_dir`.

    best=True restores the best-val-loss checkpoint; otherwise `epoch`
    (default latest). Returns (state, meta). The reference analog loads
    weights then compiles (model_utils.py:5-21); here the optimizer state
    comes back too.
    """
    tx = steps_lib.make_optimizer(learning_rate)
    abstract = steps_lib.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                           input_shape=input_shape)
    mgr = CheckpointManager(ckpt_dir, async_checkpointing=False)
    try:
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
