"""Train-state pytrees.

All mutable training state — params, optimizer moments, quantizer statistics
(EMA codebooks, usage counters), batch-norm running stats, RNG, step — lives
in one explicit pytree. This is the structural fix for the reference's racy
per-replica tf.Variable side effects (SURVEY.md §5 "race detection"): state
transitions are pure functions over this tree, and under pjit the tree is
replicated while batches are sharded, so every replica computes identical
global updates."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    vq_stats: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    # Exponential moving average of the trainable params (diffusion
    # sampling quality: Ho et al. 2020 use decay 0.9999; the reference
    # has no EMA). None when disabled — the pytree then has no extra
    # leaves, keeping old checkpoints restorable.
    ema_params: Any = None

    def variables(self):
        v = {"params": self.params}
        if self.vq_stats is not None:
            v["vq_stats"] = self.vq_stats
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


@struct.dataclass
class GANTrainState(TrainState):
    """Adds the discriminator optimizer + epoch counter for warm-up gating
    (reference vqgan_attn_cp.py:607,718-720: `epoch_counter` tf.Variable
    consulted by tf.cond)."""

    disc_opt_state: Any = None
    epoch: jax.Array = None
