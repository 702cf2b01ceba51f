"""DDPM noise schedule — precomputed coefficient tables.

Parity with reference `Betas` (networks/dm3d.py:194-214 ==
conditional_dm3d.py:215-235): linear beta in [1e-4, 0.02] over T steps and
the derived alpha / cumulative-product tables, precomputed in float64 and
held as eight [T] tables in a NamedTuple; `gather(t)` takes all eight at a
timestep (XLA fuses the per-table gathers inside the sampling scan)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Schedule(NamedTuple):
    beta: jax.Array
    alpha: jax.Array
    sqrt_alpha: jax.Array
    alpha_bar: jax.Array
    alpha_bar_prev: jax.Array
    sqrt_alpha_bar: jax.Array
    sqrt_alpha_bar_prev: jax.Array
    sqrt_one_minus_alpha_bar: jax.Array

    @property
    def timesteps(self) -> int:
        return self.beta.shape[0]

    def gather(self, t: jax.Array) -> "Schedule":
        """Gather all tables at (batched) timestep t, broadcastable over a
        [B, H, W, D, C] volume."""
        def g(tab):
            return jnp.take(tab, t, axis=0).reshape((-1,) + (1,) * 4)
        return Schedule(*(g(tab) for tab in self))


def make_schedule(timesteps: int, beta_start: float = 1e-4,
                  beta_end: float = 0.02) -> Schedule:
    beta = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha, 0)
    alpha_bar_prev = np.append(1.0, alpha_bar[:-1])
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return Schedule(
        beta=f32(beta),
        alpha=f32(alpha),
        sqrt_alpha=f32(np.sqrt(alpha)),
        alpha_bar=f32(alpha_bar),
        alpha_bar_prev=f32(alpha_bar_prev),
        sqrt_alpha_bar=f32(np.sqrt(alpha_bar)),
        sqrt_alpha_bar_prev=f32(np.sqrt(alpha_bar_prev)),
        sqrt_one_minus_alpha_bar=f32(np.sqrt(1.0 - alpha_bar)),
    )


def q_sample(sched: Schedule, latents: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion x_t = sqrt(a_bar_t) x_0 + sqrt(1-a_bar_t) eps
    (reference dm3d.py:441-450)."""
    g = sched.gather(t)
    return (g.sqrt_alpha_bar.astype(latents.dtype) * latents
            + g.sqrt_one_minus_alpha_bar.astype(latents.dtype) * noise)


def v_target(sched: Schedule, latents: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """v-parameterization target v = sqrt(abar_t) eps - sqrt(1-abar_t) x0
    (Salimans & Ho 2022, "Progressive Distillation"). Beyond-reference:
    the reference's U-Net only predicts eps (dm3d.py:453)."""
    g = sched.gather(t)
    return (g.sqrt_alpha_bar.astype(noise.dtype) * noise
            - g.sqrt_one_minus_alpha_bar.astype(noise.dtype) * latents)


def model_out_to_eps(sched: Schedule, x_t: jax.Array, t: jax.Array,
                     out: jax.Array, prediction_type: str) -> jax.Array:
    """Convert a model output to eps-space so every sampler keeps its
    eps-based update rule. For v-prediction the exact identity is
    eps = sqrt(abar_t) v + sqrt(1-abar_t) x_t (algebraic inverse of
    `v_target` given x_t = q_sample(x0, t, eps); verified in
    tests/test_diffusion.py::test_v_prediction_roundtrip)."""
    if prediction_type == "eps":
        return out
    if prediction_type != "v":
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    g = sched.gather(t)
    return (g.sqrt_alpha_bar.astype(out.dtype) * out
            + g.sqrt_one_minus_alpha_bar.astype(out.dtype) * x_t)


def min_snr_weight(sched: Schedule, t: jax.Array, gamma: float,
                   prediction_type: str) -> jax.Array:
    """Per-timestep min-SNR-gamma loss weight (Hang et al. 2023):
    min(SNR_t, gamma)/SNR_t for eps-prediction, min(SNR_t, gamma)/(SNR_t+1)
    for v-prediction. Broadcastable over [B, H, W, D, C]."""
    g = sched.gather(t)
    snr = g.alpha_bar / (1.0 - g.alpha_bar)
    clipped = jnp.minimum(snr, gamma)
    if prediction_type == "v":
        return clipped / (snr + 1.0)
    return clipped / snr


def posterior(sched: Schedule, x_t: jax.Array, pred_noise: jax.Array,
              t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Posterior mean and variance for the reverse step
    (reference DiffusionModel.sample, dm3d.py:477-508)."""
    g = sched.gather(t)
    x0 = (x_t - g.sqrt_one_minus_alpha_bar * pred_noise) / g.sqrt_alpha_bar
    mean = ((g.beta * g.sqrt_alpha_bar_prev / (1.0 - g.alpha_bar)) * x0
            + ((1.0 - g.alpha_bar_prev) * g.sqrt_alpha / (1.0 - g.alpha_bar))
            * x_t)
    variance = (1.0 - g.alpha_bar_prev) * g.beta / (1.0 - g.alpha_bar)
    return mean, variance
