"""Training callbacks — the framework-side equivalents of the reference's
Keras callback zoo (SURVEY.md §2.5/§5).

  - CSVLogger               <- keras.callbacks.CSVLogger("training.log")
                               (reference main.py:231-234)
  - ReduceLROnPlateau       <- reference main.py:236-243
  - DelayedReduceLROnPlateau<- the MISSING `networks/callbacks.py` module the
                               reference imports but never committed
                               (main_exp_vqgan_attn.py:10,89-95): a plateau
                               scheduler that only activates after
                               `start_epoch` (= disc_threshold)
  - MetricsLogger           <- W&B-compatible local JSONL metric stream
                               (wandb is used throughout the reference, e.g.
                               main_exp_vqgan_attn.py:69; this environment
                               has no egress, so runs log to disk in a
                               wandb-importable format)

Learning-rate mutation is a pure state transition: optimizers are built with
`optax.inject_hyperparams`, so the LR lives inside `opt_state` and callbacks
return an updated state instead of poking a tf.Variable.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = (
        opt_state.hyperparams["learning_rate"].dtype.type(lr)
        if hasattr(opt_state.hyperparams["learning_rate"], "dtype") else lr)
    return opt_state


class ReduceLROnPlateau:
    """Keras-semantics plateau scheduler (reference main.py:236-243:
    monitor=val/train loss, factor, patience, min_lr)."""

    def __init__(self, monitor: str = "loss", factor: float = 0.5,
                 patience: int = 10, min_lr: float = 1e-6,
                 min_delta: float = 1e-4, start_epoch: int = 0):
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.min_delta = min_delta
        self.start_epoch = start_epoch
        self._best = float("inf")
        self._wait = 0

    def __call__(self, epoch: int, metrics: Dict[str, float],
                 opt_state) -> tuple[Any, bool]:
        """Returns (opt_state, reduced?)."""
        if epoch < self.start_epoch or self.monitor not in metrics:
            return opt_state, False
        value = float(metrics[self.monitor])
        if value < self._best - self.min_delta:
            self._best = value
            self._wait = 0
            return opt_state, False
        self._wait += 1
        if self._wait < self.patience:
            return opt_state, False
        self._wait = 0
        old = get_learning_rate(opt_state)
        new = max(old * self.factor, self.min_lr)
        # relative tolerance: float32 round-trip of min_lr must not be
        # reported as a reduction once the floor is reached
        if new < old * (1.0 - 1e-6):
            return set_learning_rate(opt_state, new), True
        return opt_state, False


class DelayedReduceLROnPlateau(ReduceLROnPlateau):
    """Plateau scheduler gated on start_epoch — reconstruction of the
    reference's missing `networks.callbacks.DelayedReduceLROnPlateau`
    (imported at main_exp_vqgan_attn.py:10, configured with
    start_epoch=disc_threshold at :89-95)."""

    def __init__(self, start_epoch: int, **kwargs):
        super().__init__(start_epoch=start_epoch, **kwargs)


class CSVLogger:
    """Appends one row per epoch to training.log (Keras CSVLogger format,
    consumed by the reference's Visualize_Loss notebook)."""

    def __init__(self, path: str, append: bool = False):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fieldnames = None
        if not append and os.path.exists(path):
            os.remove(path)

    def __call__(self, epoch: int, metrics: Dict[str, float]):
        row = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        new_file = not os.path.exists(self.path)
        if self._fieldnames is None:
            if not new_file:
                # append-resume: adopt the existing file's header so
                # columns stay aligned with earlier rows
                with open(self.path, newline="") as f:
                    header = next(csv.reader(f), None)
                self._fieldnames = header or list(row.keys())
            else:
                self._fieldnames = list(row.keys())
        late = [k for k in row if k not in self._fieldnames]
        if late:
            # Columns that first appear mid-run (e.g. latent_fid at
            # fidelity_freq boundaries) widen the header: rewrite the
            # file once, back-filling earlier rows with blanks.
            self._fieldnames = self._fieldnames + late
            if not new_file:
                with open(self.path, newline="") as f:
                    old_rows = list(csv.DictReader(f))
                with open(self.path, "w", newline="") as f:
                    writer = csv.DictWriter(f, fieldnames=self._fieldnames)
                    writer.writeheader()
                    for r in old_rows:
                        writer.writerow(r)
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            if new_file:
                writer.writeheader()
            writer.writerow(row)


class ImageLogger:
    """Periodic image panels — the zero-egress equivalent of the
    reference's W&B image callbacks: orig-vs-recon slices every
    `log_freq` epochs during stage-1 training (training_utils.py:6-61,
    vqgan.py:50-105) and generated samples per context during diffusion
    training (conditional_dm3d.py:24-61). `render_fn(state) ->
    {name: volume [H,W,D(,C)]}` supplies the volumes; mid-slice montages
    are saved as `{out_dir}/epoch{N}_{name}.png`."""

    def __init__(self, out_dir: str, render_fn, log_freq: int = 10):
        self.out_dir = out_dir
        self.render_fn = render_fn
        self.log_freq = max(1, log_freq)
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, epoch: int, state) -> None:
        if (epoch + 1) % self.log_freq:
            return
        from ldm3d.utils.visualize import plot_volume_grid
        import numpy as np
        for name, vol in self.render_fn(state).items():
            tmp = os.path.join(self.out_dir,
                               f"epoch{epoch + 1}_{name}.npy")
            np.save(tmp, np.asarray(vol, np.float32))
            plot_volume_grid([tmp], tmp.replace(".npy", ".png"))
            os.remove(tmp)


class MetricsLogger:
    """JSONL metric stream (one record per epoch/step) — the zero-egress
    stand-in for the reference's wandb logging; `wandb sync`-able."""

    def __init__(self, path: str, run_name: str = "run"):
        self.path = path
        self.run_name = run_name
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def __call__(self, step: int, metrics: Dict[str, float],
                 prefix: str = ""):
        rec = {"run": self.run_name, "step": step, "time": time.time()}
        rec.update({(prefix + k): float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
