"""Legacy Keras-tutorial VQ-VAE family (reference networks/vqvae3d.py).

Two functional variants selected by `mode` (reference `args.vqvae_mode`,
vqvae3d.py:183-188):
  - mode 1 ("plain"):  get_encoder/get_decoder — 2-3 stride-2 conv levels
    (32, 64[, 128]) with a 1x1 conv to latent_dim (vqvae3d.py:95-109,
    135-149); `down` selects 2 or 3 downsamples.
  - mode 2 ("residual"): get_encoder_2/get_decoder_2 — 2 stride-2 k4 convs
    then 1x1-projected residual adds at width 128 (vqvae3d.py:80-93,
    112-133).

Trainer semantics (VQVAETrainer, vqvae3d.py:174-243): plain MSE + VQ losses;
`train_variance` normalization exists upstream but is commented out of the
train loss and only used in test (:215, :240) — mirrored here via the
optional `train_variance` argument to `test_loss`.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldm3d.models.layers import conv3d, conv3d_transpose
from ldm3d.models.quantizers import QuantAux, VectorQuantizerSTE


class LegacyEncoder(nn.Module):
    """vqvae3d.py get_encoder (:95-109)."""

    latent_dim: int = 16
    down: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(conv3d(32, 3, stride=2, dtype=self.dtype)(x))
        x = jax.nn.relu(conv3d(64, 3, stride=2, dtype=self.dtype)(x))
        if self.down == 3:
            x = jax.nn.relu(conv3d(128, 3, stride=2, dtype=self.dtype)(x))
        return conv3d(self.latent_dim, 1, dtype=self.dtype)(x)


class LegacyDecoder(nn.Module):
    """vqvae3d.py get_decoder (:135-149)."""

    out_channels: int = 1
    down: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.down == 3:
            x = jax.nn.relu(conv3d_transpose(128, 3, stride=2,
                                             dtype=self.dtype)(x))
        x = jax.nn.relu(conv3d_transpose(64, 3, stride=2,
                                         dtype=self.dtype)(x))
        x = jax.nn.relu(conv3d_transpose(32, 3, stride=2,
                                         dtype=self.dtype)(x))
        return conv3d_transpose(self.out_channels, 3, stride=1,
                                dtype=self.dtype)(x)


class LegacyEncoder2(nn.Module):
    """vqvae3d.py get_encoder_2 (:80-93): post-conv residual adds."""

    latent_dim: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(conv3d(32, 4, stride=2, dtype=self.dtype)(x))
        x = jax.nn.relu(conv3d(64, 4, stride=2, dtype=self.dtype)(x))
        y = jax.nn.relu(conv3d(128, 3, dtype=self.dtype)(x))
        x = conv3d(128, 1, dtype=self.dtype)(x) + y
        y = jax.nn.relu(conv3d(128, 3, dtype=self.dtype)(x))
        x = conv3d(128, 1, dtype=self.dtype)(x) + y
        return conv3d(self.latent_dim, 1, dtype=self.dtype)(x)


class LegacyDecoder2(nn.Module):
    """vqvae3d.py get_decoder_2 (:112-133)."""

    out_channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(conv3d_transpose(128, 1, stride=1,
                                         dtype=self.dtype)(x))
        y = jax.nn.relu(conv3d_transpose(128, 3, stride=1,
                                         dtype=self.dtype)(x))
        x = conv3d_transpose(128, 1, stride=1, dtype=self.dtype)(y) + x
        y = jax.nn.relu(conv3d_transpose(128, 3, stride=1,
                                         dtype=self.dtype)(x))
        x = conv3d_transpose(128, 1, stride=1, dtype=self.dtype)(y) + x
        x = jax.nn.relu(conv3d_transpose(64, 4, stride=2,
                                         dtype=self.dtype)(x))
        x = jax.nn.relu(conv3d_transpose(32, 4, stride=2,
                                         dtype=self.dtype)(x))
        return conv3d_transpose(self.out_channels, 3, stride=1,
                                dtype=self.dtype)(x)


class LegacyVQVAE(nn.Module):
    """get_vqvae / get_vqvae_2 (vqvae3d.py:152-172)."""

    latent_dim: int = 16
    num_embeddings: int = 64
    mode: int = 1          # 1 = plain, 2 = residual
    down: int = 3
    out_channels: int = 1
    dtype: Any = jnp.bfloat16

    def setup(self):
        if self.mode == 1:
            self.encoder = LegacyEncoder(self.latent_dim, self.down,
                                         dtype=self.dtype)
            self.decoder = LegacyDecoder(self.out_channels, self.down,
                                         dtype=self.dtype)
        else:
            self.encoder = LegacyEncoder2(self.latent_dim, dtype=self.dtype)
            self.decoder = LegacyDecoder2(self.out_channels,
                                          dtype=self.dtype)
        self.quantizer = VectorQuantizerSTE(self.num_embeddings,
                                            self.latent_dim)

    def __call__(self, x, training: bool = True) -> Tuple[jax.Array, QuantAux]:
        z = self.encoder(x)
        q, aux = self.quantizer(z, training)
        return self.decoder(q), aux


def test_loss(x, recon, train_variance: float = 0.0949):
    """Reference test-time normalized MSE (vqvae3d.py:236-242)."""
    return jnp.mean(jnp.square(x - recon)) / train_variance
