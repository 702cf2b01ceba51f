"""The epoch training loop — the framework's `Model.fit`.

Replaces the Keras fit + callback stack the reference drives from its entry
points (reference main.py:263-271: ModelCheckpoint + CSVLogger +
ReduceLROnPlateau + ReplaceCodebookCallback; main_exp_vqgan_attn.py:89-102
adds EpochCounter + DelayedReduceLROnPlateau). One loop serves all three
trainer families (VQ-VAE, VQ-GAN, diffusion); everything inside the epoch is
jit-compiled steps, everything between epochs is pure state transitions.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ldm3d.train.callbacks import CSVLogger, MetricsLogger, ReduceLROnPlateau
from ldm3d.train.checkpoint import CheckpointManager


def _mean_metrics(history):
    # ONE bulk transfer for the whole epoch's metric scalars: device_get
    # schedules async copies for every leaf before blocking. Fetching each
    # scalar with float() serializes hundreds of relay round-trips per
    # epoch (measured: the dominant epoch cost on cached-latent stage-2,
    # runs/r3_flagship_q10.log 44-110 s vs ~2 s program time).
    history = jax.device_get(history)
    out = {}
    for k in history[0]:
        out[k] = float(np.mean([float(h[k]) for h in history]))
    return out


def fit(trainer, state, train_loader, epochs: int,
        val_loader=None,
        ckpt: Optional[CheckpointManager] = None,
        csv_logger: Optional[CSVLogger] = None,
        metrics_logger: Optional[MetricsLogger] = None,
        lr_schedule: Optional[ReduceLROnPlateau] = None,
        replace_codebook_freq: int = 0,
        initial_epoch: int = 0,
        ckpt_freq: int = 1,
        step_fn: Optional[Callable] = None,
        eval_fn: Optional[Callable] = None,
        is_gan: bool = False,
        rng=None,
        image_logger=None,
        epoch_callback: Optional[Callable] = None,
        verbose: bool = True):
    """Train for `epochs`, returning the final state and the last metrics.

    - `step_fn(state, batch) -> (state, metrics)` defaults to
      `trainer.train_step(state, vol, mask)`.
    - `replace_codebook_freq` mirrors ReplaceCodebookCallback(frequency=10)
      (reference vqvae3d_monai.py:100-109).
    - `is_gan` advances the epoch counter used for discriminator warm-up.
    - `epoch_callback(epoch, state) -> dict` runs after the epoch's state
      transitions; returned entries merge into the logged metrics (used
      for the latent-fidelity measurement during --train_dm).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    last_metrics: Dict[str, float] = {}
    # best-metric checkpoint pinning (VERDICT r4 next-5): the epoch with
    # the best latent-FID (stage 2) / best val-PSNR (stage 1) is saved even
    # off `ckpt_freq` and exempted from retention, so overtraining past the
    # best model can never prune it. First matching metric wins.
    _PIN_RULES = (("latent_fid", "min"), ("val_psnr", "max"))
    best_pin: Dict[str, float] = {}

    for epoch in range(initial_epoch, epochs):
        t0 = time.time()
        history = []
        num_batches = 0
        for batch in train_loader:
            if step_fn is not None:
                state, metrics = step_fn(state, batch)
            else:
                vol, mask = batch[0], batch[1]
                state, metrics = trainer.train_step(state, vol, mask)
            history.append(metrics)
            num_batches += 1
        if not history:
            raise ValueError("empty training loader")
        train_metrics = _mean_metrics(history)

        val_metrics = {}
        if val_loader is not None:
            vh = []
            # per-epoch, per-batch eval key: GAN eval scores a random 2D
            # frame per volume, and a fixed key would score the same
            # coronal slices every epoch, narrowing val metrics
            eval_key = jax.random.fold_in(rng, 1000 + epoch)
            for i, batch in enumerate(val_loader):
                if eval_fn is not None:
                    vh.append(eval_fn(state, batch))
                elif is_gan:
                    vh.append(trainer.eval_step(
                        state, batch[0], batch[1],
                        rng=jax.random.fold_in(eval_key, i)))
                else:
                    vh.append(trainer.eval_step(state, batch[0], batch[1]))
            if vh:
                val_metrics = {f"val_{k}": v
                               for k, v in _mean_metrics(vh).items()}

        last_metrics = {**train_metrics, **val_metrics}

        # -- between-epoch state transitions --
        if is_gan:
            state = trainer.next_epoch(state)
        if (replace_codebook_freq and
                (epoch + 1) % replace_codebook_freq == 0 and
                hasattr(trainer, "replace_unused")):
            rng, sub = jax.random.split(rng)
            state, n_replaced = trainer.replace_unused(state, num_batches, sub)
            last_metrics["codebooks_replaced"] = float(n_replaced)
        if lr_schedule is not None:
            new_opt, reduced = lr_schedule(epoch, last_metrics,
                                           state.opt_state)
            if reduced:
                state = state.replace(opt_state=new_opt)
                if verbose:
                    from ldm3d.train.callbacks import get_learning_rate
                    print(f"epoch {epoch + 1}: lr -> "
                          f"{get_learning_rate(new_opt):.2e}")

        if epoch_callback is not None:
            extra = epoch_callback(epoch, state)
            if extra:
                last_metrics.update({k: float(v) for k, v in extra.items()})

        # -- logging / checkpointing --
        if csv_logger is not None:
            csv_logger(epoch, last_metrics)
        if metrics_logger is not None:
            metrics_logger(epoch, last_metrics)
        if image_logger is not None:
            image_logger(epoch, state)
        pin = None
        if ckpt is not None:
            for name, mode in _PIN_RULES:
                if name not in last_metrics:
                    continue
                v = last_metrics[name]
                prev = best_pin.get(name)
                if prev is None or (v < prev if mode == "min" else v > prev):
                    best_pin[name] = v
                    pin = f"best_{name}"
                break
        if ckpt is not None and (pin is not None
                                 or (epoch + 1) % max(ckpt_freq, 1) == 0
                                 or epoch + 1 == epochs):
            # ckpt_freq > 1 trades recovery granularity for wall-clock:
            # with fused epochs the full-state device_get + orbax write is
            # the dominant per-epoch cost (always saves the final epoch).
            # A new best-metric epoch always saves and pins (never pruned).
            monitor = last_metrics.get("val_loss", last_metrics.get("loss"))
            ckpt.save(epoch + 1, jax.device_get(state), metric=monitor,
                      pin=pin)
            if pin is not None:
                # record the selection in the metric stream so bench /
                # reports can see which epoch holds the best model
                last_metrics["pinned_best"] = 1.0
                if metrics_logger is not None:
                    metrics_logger(epoch, {pin: best_pin[name],
                                           "pinned_epoch": epoch + 1})
        if verbose:
            dt = time.time() - t0
            msg = " ".join(f"{k}={v:.5f}" for k, v in last_metrics.items()
                           if isinstance(v, float))
            print(f"epoch {epoch + 1}/{epochs} [{dt:.1f}s "
                  f"{num_batches} steps] {msg}")

    return state, last_metrics


def fit_with_recovery(trainer, state, train_loader, epochs: int,
                      ckpt: CheckpointManager, max_restarts: int = 2,
                      initial_epoch: int = 0, verbose: bool = True,
                      **fit_kwargs):
    """`fit` wrapped with automatic failure recovery — the elastic-restart
    capability the reference lacks (SURVEY.md §5: crashes in its logs were
    handled by manually resubmitting Slurm jobs). On any exception the
    latest orbax checkpoint is restored and training resumes from that
    epoch, up to `max_restarts` times."""
    restarts = 0
    while True:
        try:
            return fit(trainer, state, train_loader, epochs, ckpt=ckpt,
                       initial_epoch=initial_epoch, verbose=verbose,
                       **fit_kwargs)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            restarts += 1
            if restarts > max_restarts or ckpt is None:
                raise
            ckpt.wait()
            template = jax.device_get(state)
            try:
                state, initial_epoch = ckpt.restore(template)
            except FileNotFoundError:
                initial_epoch = 0  # nothing saved yet: restart from scratch
            if verbose:
                print(f"recovered from '{type(e).__name__}: {e}' — "
                      f"resuming at epoch {initial_epoch} "
                      f"(restart {restarts}/{max_restarts})")
