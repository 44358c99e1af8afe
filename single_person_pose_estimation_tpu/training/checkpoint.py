"""Checkpointing: Orbax-backed save/restore of the full training state.

The reference checkpoints weights only, so Adam moments silently reset on
every resume and the learning rate must be re-set by hand
(trainer.py:85-90); its best-checkpoint promotion is a manual file swap
(trainer.py:143-170). Here a checkpoint carries params + BN statistics +
optimizer state + PRNG key + epoch/best-val metadata, saved (optionally
async) through Orbax:

    <ckpt_dir>/latest/<epoch>/   rolling recent checkpoints (resume point)
    <ckpt_dir>/best/0/           best-val-loss checkpoint (promotion target)

Best-by-val-loss promotion semantics are preserved: `maybe_promote_best`
keeps the best/ checkpoint in sync with the lowest validation loss seen
across ALL sessions.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from single_person_pose_estimation_tpu.training.steps import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(path)


class CheckpointManager:
    """Latest + best checkpoint management for TrainState."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3,
                 async_checkpointing: bool = True):
        self.ckpt_dir = _abs(ckpt_dir)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_checkpointing)
        best_opts = ocp.CheckpointManagerOptions(
            max_to_keep=1, enable_async_checkpointing=async_checkpointing)
        self._latest = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, "latest"), options=opts)
        self._best = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, "best"), options=best_opts)

    # -- save ------------------------------------------------------------

    def save(self, epoch: int, state: TrainState, meta: dict) -> None:
        """Save state + metadata under the given epoch number."""
        self._latest.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )

    def save_best(self, state: TrainState, meta: dict) -> None:
        if self._best.latest_step() is not None:
            # Orbax refuses to overwrite an existing step; drop the old best
            # (completing any in-flight async save first).
            self._best.wait_until_finished()
            self._best.delete(0)
        self._best.save(
            0,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
            force=True,
        )

    def maybe_promote_best(self, val_loss: float, state: TrainState,
                           meta: dict) -> bool:
        """Promote `state` to best/ iff `val_loss` beats the stored best.
        Returns True when promoted."""
        best_meta = self.best_meta()
        prev = best_meta.get("val_loss") if best_meta else None
        if prev is None or val_loss < prev:
            self.save_best(state, {**meta, "val_loss": float(val_loss)})
            return True
        return False

    # -- restore ---------------------------------------------------------

    def latest_epoch(self) -> Optional[int]:
        return self._latest.latest_step()

    def restore(self, abstract_state: TrainState, epoch: Optional[int] = None
                ) -> Tuple[TrainState, dict]:
        """Restore (state, meta) at `epoch` (default: latest).

        `abstract_state` provides the pytree structure/shapes (build it with
        TrainState.create on the same model/optimizer).
        """
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
        restored = self._latest.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def restore_best(self, abstract_state: TrainState) -> Tuple[TrainState, dict]:
        if self._best.latest_step() is None:
            raise FileNotFoundError(f"no best checkpoint in {self.ckpt_dir}")
        restored = self._best.restore(
            0,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def read_meta(self, epoch: Optional[int] = None,
                  best: bool = False) -> Optional[dict]:
        """Restore ONLY the metadata dict (no state tree needed) — lets a
        loader discover how to build the matching abstract opt_state
        (lr schedule / EMA components) before the full restore."""
        if best:
            return self.best_meta()
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            return None
        restored = self._latest.restore(
            epoch, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
        return restored["meta"]

    def best_meta(self) -> Optional[dict]:
        if self._best.latest_step() is None:
            return None
        restored = self._best.restore(
            0, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
        return restored["meta"]

    def wait(self) -> None:
        """Block until in-flight async saves land."""
        self._latest.wait_until_finished()
        self._best.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._latest.close()
        self._best.close()
