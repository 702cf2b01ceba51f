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

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Epoch-indexed checkpoints with retention, mirroring the reference's
    epoch-numbered files. Also supports `save_best_only` (main.py:498).

    Retention is managed here rather than by orbax's `max_to_keep` so that
    *pinned* epochs — the best-metric checkpoints (best latent-FID for
    stage 2, best val-PSNR for stage 1) — are NEVER pruned regardless of
    `keep`. Motivation: the round-4 flagship's best-FID epoch (49.2 @ 50)
    was silently pruned by keep=5 while training overtrained to FID 109,
    losing the model a user would actually deploy (VERDICT r4 weak #6).
    Pins persist in `pinned.json` so resume keeps honoring them."""

    def __init__(self, directory: str, keep: int = 5,
                 save_best_only: bool = False):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.save_best_only = save_best_only
        self.keep = keep
        self._best = float("inf")
        self._pin_path = os.path.join(directory, "pinned.json")
        self._pinned: dict[str, int] = {}
        if os.path.exists(self._pin_path):
            try:
                with open(self._pin_path) as f:
                    self._pinned = {k: int(v) for k, v in json.load(f).items()}
            except (OSError, ValueError):
                self._pinned = {}
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None, create=True, enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, epoch: int, state: Any,
             metric: Optional[float] = None,
             pin: Optional[str] = None) -> bool:
        """Save at `epoch`; with save_best_only, skip unless `metric`
        improved (reference ModelCheckpoint(save_best_only=True)).

        `pin` names a best-metric slot (e.g. "best_latent_fid"): this
        epoch replaces the slot's previous holder and is exempt from the
        `keep` retention window until a better epoch takes the slot."""
        if self.save_best_only and metric is not None:
            if metric >= self._best:
                return False
            self._best = metric
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if pin is not None:
            self._pinned[pin] = epoch
            tmp = self._pin_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._pinned, f)
            os.replace(tmp, self._pin_path)
        self._prune()
        return True

    def pinned(self) -> dict[str, int]:
        """Current pin slots: {slot_name: epoch}."""
        return dict(self._pinned)

    def _prune(self):
        """Delete all but the most recent `keep` epochs and every pinned
        epoch. The just-saved step is always in the recent window."""
        if not self.keep:
            return
        steps = sorted(self._mgr.all_steps())
        keep_set = set(steps[-self.keep:]) | set(self._pinned.values())
        for s in steps:
            if s not in keep_set:
                try:
                    self._mgr.delete(s)
                except Exception:  # noqa: BLE001 - retention is best-effort
                    pass

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
