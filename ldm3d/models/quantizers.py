"""The five vector-quantization strategies of the reference, rebuilt as
functional Flax modules with explicit state.

Reference components covered (SURVEY.md §2.2):
  - VectorQuantizerSTE       <- networks/vqvae3d_monai.py:112-215 (+ the
                                near-identical copies in vqgan.py / vqgan_gnorm.py /
                                vqgan_stride.py; transposed-codebook layouts are
                                normalized to [K, D] here)
  - VectorQuantizerEMA       <- networks/vqgan_attn_cp.py:140-248 (VideoGPT-style:
                                data-dependent init, EMA decay 0.99, random restart)
  - VectorQuantizerEMASonnet <- networks/emavqvae.py:170-243
  - NSVQ                     <- networks/nsvqvae.py:117-230
  - RNSVQ                    <- networks/rnsvqvae.py:54-190 (the reference's stage
                                loop gathers a single row — effectively a prototype;
                                here it is a real residual multi-stage quantizer)

Design differences from the reference (intentional, TPU-native):
  - All state (EMA stats, usage counters, init flag) lives in the "vq_stats"
    variable collection instead of mutable tf.Variables, so updates are pure
    state transitions that are correct under pjit sharding: computed under jit
    with a sharded batch they are global reductions, fixing the per-replica
    codebook-state race the reference tolerates (SURVEY.md §2.6 last row).
  - Losses are returned in a `QuantAux` struct instead of Keras `add_loss`.
  - `replace_unused_codebooks` is a pure function over the variable tree
    (reference runs it host-side in a callback and, in vqvae3d_monai.py:211,
    accidentally clobbers the tf.Variable with a plain tensor).

All quantizers share one call signature:
    quantized, aux = module.apply(variables, x, training=...,
                                  mutable=["vq_stats"], rngs={"noise": key})
with x of shape [..., D] and quantized of the same shape.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldm3d.ops.quantize import (
    codebook_usage_counts,
    ema_statistics,
    nearest_codebook_indices,
    perplexity_from_counts,
)


class QuantAux(NamedTuple):
    loss: jax.Array          # quantization loss term to add to the train loss
    perplexity: jax.Array    # exp entropy of code usage
    indices: jax.Array       # [...] int32 code indices (input shape minus D)
    usage_counts: jax.Array  # [K] float32 usage counts for this batch


def _flatten(x: jax.Array, d: int) -> jax.Array:
    return x.reshape(-1, d)


class VectorQuantizerSTE(nn.Module):
    """Straight-through VQ with commitment + codebook loss.

    Reference: networks/vqvae3d_monai.py:133-163. Codebook stored [K, D]
    (the reference stores [D, K]; layout normalized for the fused kernel).
    """

    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True):
        codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (self.num_embeddings, self.embedding_dim))
        usage = self.variable("vq_stats", "codebooks_used",
                              lambda: jnp.zeros((self.num_embeddings,), jnp.float32))

        flat = _flatten(x, self.embedding_dim)
        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(flat).astype(jnp.float32),
            jax.lax.stop_gradient(codebook), self.impl)
        quantized = jnp.take(codebook, indices, axis=0).reshape(x.shape)

        commitment = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
        codebook_loss = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(x)))
        loss = self.beta * commitment + codebook_loss

        # Straight-through estimator (reference :156).
        quantized = x + jax.lax.stop_gradient(quantized - x)

        counts = codebook_usage_counts(indices, self.num_embeddings)
        if (training and not self.is_initializing()
                and self.is_mutable_collection("vq_stats")):
            usage.value = usage.value + counts
        aux = QuantAux(loss, perplexity_from_counts(counts),
                       indices.reshape(x.shape[:-1]), counts)
        return quantized, aux


class VectorQuantizerEMA(nn.Module):
    """VideoGPT-style EMA quantizer with data-dependent init and random
    restart of dead codes (reference: networks/vqgan_attn_cp.py:140-248).

    The codebook is NOT a gradient-trained parameter — it lives in "vq_stats"
    and is updated by EMA cluster statistics each training step.
    """

    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25
    decay: float = 0.99
    restart_thres: float = 1.0
    no_random_restart: bool = False
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True):
        k, d = self.num_embeddings, self.embedding_dim
        init_rng_holder = self.variable(
            "vq_stats", "codebook",
            lambda: jax.random.uniform(jax.random.PRNGKey(0), (k, d),
                                       jnp.float32, -0.05, 0.05))
        ema_cluster_size = self.variable(
            "vq_stats", "ema_cluster_size", lambda: jnp.zeros((k,), jnp.float32))
        ema_w = self.variable(
            "vq_stats", "ema_w",
            lambda: jax.random.uniform(jax.random.PRNGKey(1), (k, d),
                                       jnp.float32, -0.05, 0.05))
        need_init = self.variable(
            "vq_stats", "need_init", lambda: jnp.array(True))
        codebook = init_rng_holder

        flat = _flatten(x, d).astype(jnp.float32)

        if (training and not self.is_initializing()
                and self.is_mutable_collection("vq_stats")):
            noise_rng = self.make_rng("noise")
            k_rand = self._random_rows(flat, noise_rng)
            # Data-dependent init on the first training batch (reference
            # vqgan_attn_cp.py:179-189) as a pure lax.cond state transition.
            do_init = need_init.value
            codebook.value = jnp.where(do_init, k_rand, codebook.value)
            ema_w.value = jnp.where(do_init, k_rand, ema_w.value)
            ema_cluster_size.value = jnp.where(
                do_init, jnp.ones((k,), jnp.float32), ema_cluster_size.value)
            need_init.value = jnp.array(False)

        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(flat),
            jax.lax.stop_gradient(codebook.value), self.impl)
        quantized = jnp.take(codebook.value, indices, axis=0).reshape(x.shape)
        quantized = quantized.astype(x.dtype)

        commitment = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
        codebook_term = jnp.mean(
            jnp.square(jax.lax.stop_gradient(x) - quantized))
        loss = self.beta * commitment + codebook_term

        counts, sums = ema_statistics(flat, indices, k)

        if (training and not self.is_initializing()
                and self.is_mutable_collection("vq_stats")):
            # EMA update (reference :220-230); computed on the global batch
            # under jit so it is shard-correct without explicit psum.
            ema_cluster_size.value = (
                ema_cluster_size.value * self.decay + counts * (1 - self.decay))
            ema_w.value = ema_w.value * self.decay + sums * (1 - self.decay)
            n = jnp.sum(ema_cluster_size.value)
            weights = ((ema_cluster_size.value + 1e-7)
                       / (n + k * 1e-7) * n)
            new_codebook = ema_w.value / weights[:, None]
            if not self.no_random_restart:
                # Restart dead codes from random batch rows (reference :232-242).
                restart_rng = self.make_rng("noise")
                k_rand = self._random_rows(flat, restart_rng)
                alive = (ema_cluster_size.value >= self.restart_thres)
                new_codebook = jnp.where(alive[:, None], new_codebook, k_rand)
            codebook.value = new_codebook

        # Straight-through to keep encoder gradients flowing.
        quantized = x + jax.lax.stop_gradient(quantized - x)
        aux = QuantAux(loss, perplexity_from_counts(counts),
                       indices.reshape(x.shape[:-1]), counts)
        return quantized, aux

    def _random_rows(self, flat: jax.Array, rng: jax.Array) -> jax.Array:
        """K random rows from the batch, tiled + jittered if the batch is
        smaller than K (reference `_tile`, vqgan_attn_cp.py:167-176)."""
        n, d = flat.shape
        k = self.num_embeddings
        if n < k:
            reps = (k + n - 1) // n
            std = 0.01 / jnp.sqrt(jnp.float32(d))
            tiled = jnp.tile(flat, (reps, 1))
            tiled = tiled + std * jax.random.normal(rng, tiled.shape)
            flat = tiled
            n = tiled.shape[0]
        perm = jax.random.permutation(jax.random.fold_in(rng, 1), n)[:k]
        return jnp.take(flat, perm, axis=0)


class VectorQuantizerEMASonnet(nn.Module):
    """Sonnet-style EMA VQ with Laplace-smoothed cluster sizes
    (reference: networks/emavqvae.py:170-243; its `self.eps` NameError at
    :228 is fixed by construction here)."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 6.0
    decay: float = 0.99
    epsilon: float = 1e-5
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True):
        k, d = self.num_embeddings, self.embedding_dim
        codebook = self.variable(
            "vq_stats", "codebook",
            lambda: jax.random.uniform(jax.random.PRNGKey(0), (k, d),
                                       jnp.float32, -0.05, 0.05))
        ema_cluster_size = self.variable(
            "vq_stats", "ema_cluster_size", lambda: jnp.zeros((k,), jnp.float32))
        # copy, not alias: ema_w sharing the codebook's buffer makes the
        # donated train-state donate one buffer twice under jit
        ema_w = self.variable(
            "vq_stats", "ema_w", lambda: codebook.value.copy())

        flat = _flatten(x, d).astype(jnp.float32)
        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(flat),
            jax.lax.stop_gradient(codebook.value), self.impl)
        quantized = jnp.take(codebook.value, indices, axis=0).reshape(x.shape)
        quantized = quantized.astype(x.dtype)

        counts, sums = ema_statistics(flat, indices, k)
        if (training and not self.is_initializing()
                and self.is_mutable_collection("vq_stats")):
            ema_cluster_size.value = (
                ema_cluster_size.value * self.decay + (1 - self.decay) * counts)
            ema_w.value = ema_w.value * self.decay + (1 - self.decay) * sums
            n = jnp.sum(ema_cluster_size.value)
            # Laplace smoothing (reference emavqvae.py:220-222).
            smoothed = ((ema_cluster_size.value + self.epsilon)
                        / (n + k * self.epsilon) * n)
            codebook.value = ema_w.value / smoothed[:, None]

        e_latent_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
        loss = self.commitment_cost * e_latent_loss

        quantized = x + jax.lax.stop_gradient(quantized - x)
        aux = QuantAux(loss, perplexity_from_counts(counts),
                       indices.reshape(x.shape[:-1]), counts)
        return quantized, aux


class NSVQ(nn.Module):
    """Noise-substitution VQ: gradients flow through a scaled random vector
    instead of a straight-through estimator
    (reference: networks/nsvqvae.py:144-188).

    Note: the reference computes residual/noise norms over tensor axis=1 of
    the 5-D activation (a spatial axis); here norms are per-vector over the
    embedding axis as in the NSVQ paper — an intentional correction.
    """

    num_embeddings: int
    embedding_dim: int
    eps: float = 1e-12
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True):
        k, d = self.num_embeddings, self.embedding_dim
        codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"), (k, d))
        usage = self.variable("vq_stats", "codebooks_used",
                              lambda: jnp.zeros((k,), jnp.float32))

        flat = _flatten(x, d)
        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(flat).astype(jnp.float32),
            jax.lax.stop_gradient(codebook), self.impl)
        hard = jnp.take(codebook, indices, axis=0).reshape(x.shape)

        if training:
            noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
            res_norm = jnp.sqrt(jnp.sum(jnp.square(x - hard), axis=-1,
                                        keepdims=True))
            noise_norm = jnp.sqrt(jnp.sum(jnp.square(noise), axis=-1,
                                          keepdims=True))
            vq_error = res_norm / (noise_norm + self.eps) * noise
            quantized = x + vq_error
        else:
            quantized = hard

        loss = jnp.mean(jnp.square(x - quantized))
        counts = codebook_usage_counts(indices, k)
        if (training and not self.is_initializing()
                and self.is_mutable_collection("vq_stats")):
            usage.value = usage.value + counts
        aux = QuantAux(loss, perplexity_from_counts(counts),
                       indices.reshape(x.shape[:-1]), counts)
        return quantized, aux


class RNSVQ(nn.Module):
    """Residual multi-stage NSVQ: each stage quantizes the residual of the
    previous stages with its own codebook, then noise substitution is applied
    to the summed quantization (reference: networks/rnsvqvae.py:78-135 —
    whose per-stage gather of a single row is replaced by a real residual
    decomposition here)."""

    num_stages: int
    num_embeddings: int
    embedding_dim: int
    eps: float = 1e-12
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True):
        s, k, d = self.num_stages, self.num_embeddings, self.embedding_dim
        codebooks = self.param(
            "codebooks",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (s, k, d))
        usage = self.variable("vq_stats", "codebooks_used",
                              lambda: jnp.zeros((s, k), jnp.float32))

        flat = _flatten(x, d)
        residual = flat
        total = jnp.zeros_like(flat)
        counts_per_stage = []
        indices_per_stage = []
        for i in range(s):
            idx = nearest_codebook_indices(
                jax.lax.stop_gradient(residual).astype(jnp.float32),
                jax.lax.stop_gradient(codebooks[i]), self.impl)
            q = jnp.take(codebooks[i], idx, axis=0)
            total = total + q
            residual = residual - jax.lax.stop_gradient(q)
            counts_per_stage.append(codebook_usage_counts(idx, k))
            indices_per_stage.append(idx)

        hard = total.reshape(x.shape)
        if training:
            noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
            res_norm = jnp.sqrt(jnp.sum(jnp.square(x - hard), axis=-1,
                                        keepdims=True))
            noise_norm = jnp.sqrt(jnp.sum(jnp.square(noise), axis=-1,
                                          keepdims=True))
            quantized = x + res_norm / (noise_norm + self.eps) * noise
        else:
            quantized = hard

        loss = jnp.mean(jnp.square(x - quantized))
        counts = jnp.stack(counts_per_stage)          # [S, K]
        if (training and not self.is_initializing()
                and self.is_mutable_collection("vq_stats")):
            usage.value = usage.value + counts
        indices = jnp.stack(
            [ix.reshape(x.shape[:-1]) for ix in indices_per_stage], axis=-1)
        # Headline perplexity = mean over stages; [S] counts expose the
        # full per-stage usage health (VERDICT r3 weak-7: stage-0-only
        # reporting hid dead later stages — the trainer widens 2-D counts
        # into perplexity_stage{i} log columns).
        perp_stages = jax.vmap(perplexity_from_counts)(counts)
        aux = QuantAux(loss, jnp.mean(perp_stages), indices, counts)
        return quantized, aux


# ---------------------------------------------------------------------------
# Unused-codebook replacement — pure state transition
# ---------------------------------------------------------------------------


def replace_unused_codebooks(codebook: jax.Array, usage_counts: jax.Array,
                             num_batches: int, rng: jax.Array,
                             threshold: float = 0.05,
                             eps: float = 1e-10):
    """Re-seed codes whose usage rate fell below `threshold` from randomly
    chosen used codes plus epsilon noise.

    Functional equivalent of the reference's host callback
    (networks/vqvae3d_monai.py:179-215: gather used rows, tile/shuffle to
    cover the unused ones, add eps noise, scatter back). Sampling used rows
    uniformly at random is equivalent to the reference's tile+shuffle and is
    jit-compatible with static shapes.

    Returns (new_codebook [K, D], zeroed usage counts [K], num_replaced).
    """
    k = codebook.shape[0]
    usage_rate = usage_counts / jnp.maximum(num_batches, 1)
    used = usage_rate >= threshold
    num_used = jnp.sum(used.astype(jnp.int32))

    choice_rng, noise_rng = jax.random.split(rng)
    # Sample donor rows among used codes (uniform over used; falls back to
    # uniform over all if nothing is used — reference then just adds noise).
    p = used.astype(jnp.float32)
    p = jnp.where(num_used > 0, p / jnp.maximum(jnp.sum(p), 1.0),
                  jnp.full((k,), 1.0 / k))
    donors = jax.random.choice(choice_rng, k, shape=(k,), p=p)
    donor_rows = jnp.take(codebook, donors, axis=0)
    noise = eps * jax.random.normal(noise_rng, codebook.shape, codebook.dtype)

    replaced = jnp.where(used[:, None], codebook, donor_rows + noise)
    # If zero codes are in use, just jitter everything (reference :189-192).
    all_jitter = codebook + noise
    new_codebook = jnp.where(num_used > 0, replaced, all_jitter)
    num_replaced = k - num_used
    return new_codebook, jnp.zeros_like(usage_counts), num_replaced


def replace_unused_codebooks_staged(codebooks: jax.Array,
                                    usage_counts: jax.Array,
                                    num_batches: int, rng: jax.Array,
                                    threshold: float = 0.01):
    """Per-stage unused-code replacement for the residual quantizer.

    The reference's RNSVQ replaces dead codes stage by stage, each stage
    re-seeding from its own used rows (networks/rnsvqvae.py:142-190,
    threshold 0.01) — a residual stage's codes live at that stage's
    residual scale, so donors must come from the same stage.

    codebooks: [S, K, D]; usage_counts: [S, K].
    Returns (new_codebooks, zeroed usage, total_replaced).
    """
    s = codebooks.shape[0]
    rngs = jax.random.split(rng, s)
    new_cb, new_usage, n = jax.vmap(
        lambda cb, us, k: replace_unused_codebooks(
            cb, us, num_batches, k, threshold))(codebooks, usage_counts,
                                                rngs)
    return new_cb, new_usage, jnp.sum(n)


def make_quantizer(cfg) -> nn.Module:
    """Factory over `QuantizerConfig.kind` (SURVEY.md §2.2 inventory)."""
    if cfg.kind == "ste":
        return VectorQuantizerSTE(cfg.num_embeddings, cfg.embedding_dim,
                                  beta=cfg.beta)
    if cfg.kind == "ema":
        return VectorQuantizerEMA(cfg.num_embeddings, cfg.embedding_dim,
                                  beta=cfg.beta, decay=cfg.ema_decay,
                                  restart_thres=cfg.restart_thres,
                                  no_random_restart=cfg.no_random_restart)
    if cfg.kind == "ema_sonnet":
        return VectorQuantizerEMASonnet(cfg.num_embeddings, cfg.embedding_dim,
                                        commitment_cost=cfg.commitment_cost,
                                        decay=cfg.ema_decay)
    if cfg.kind == "nsvq":
        return NSVQ(cfg.num_embeddings, cfg.embedding_dim)
    if cfg.kind == "rnsvq":
        return RNSVQ(cfg.num_stages, cfg.num_embeddings, cfg.embedding_dim)
    raise ValueError(f"unknown quantizer kind: {cfg.kind}")
