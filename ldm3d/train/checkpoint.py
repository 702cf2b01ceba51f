"""Checkpoint / resume via orbax.

Replaces Keras `ModelCheckpoint(save_weights_only=True)` writing
`{root}/{suffix}/{epoch}.ckpt` plus manual `--resume_ckpt N` +
`initial_epoch=N` bookkeeping (reference main.py:224-259,
main_conditional_dm.py:174-183) with async orbax checkpointing of the FULL
train state — params, optimizer moments, EMA codebook stats, batch-norm
stats, RNG, step — so resume is exact, including quantizer state the
reference silently loses between restarts (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Epoch-indexed checkpoints with retention, mirroring the reference's
    epoch-numbered files. Also supports `save_best_only` (main.py:498)."""

    def __init__(self, directory: str, keep: int = 5,
                 save_best_only: bool = False):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.save_best_only = save_best_only
        self._best = float("inf")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, epoch: int, state: Any,
             metric: Optional[float] = None) -> bool:
        """Save at `epoch`; with save_best_only, skip unless `metric`
        improved (reference ModelCheckpoint(save_best_only=True))."""
        if self.save_best_only and metric is not None:
            if metric >= self._best:
                return False
            self._best = metric
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        return True

    def restore(self, state_template: Any,
                epoch: Optional[int] = None) -> tuple[Any, int]:
        """Restore (state, epoch). `epoch=None` restores the latest
        (reference resume: load_weights(f"{epoch}.ckpt"))."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
