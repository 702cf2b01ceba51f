"""Lightweight EMA VQ-VAE with U-Net-style skip decoder + generic 3D U-Net.

Reference: networks/emavqvae.py + networks/emavqvae_model.py — the family is
orphaned upstream (main_emavqvae.py is 0 bytes) but is part of the component
inventory (SURVEY.md §2.3 row 4), so it is runnable here.

  - SkipVQEncoder   <- VQEncoder (emavqvae.py:5-59): 4x k4-s2 conv ladder
    (f, 2f, 4f -> embedding_dim), optional BatchNorm, returns the three
    intermediate activations for skip connections.
  - SkipVQDecoder   <- VQDecoder_skip (emavqvae.py:62-114): mirror transpose
    ladder with channel-concat skips.
  - EMAVQVAE3D      <- VQVAE3D (emavqvae_model.py:4-18): encoder ->
    Sonnet-style EMA quantizer -> skip decoder.
  - UNet3DSegment   <- UNet (emavqvae_model.py:21-53) with DoubleConv/
    Down/Up blocks (emavqvae.py:117-167).

Note on the reference's skip+VQ interaction: feeding encoder activations
around the quantizer means the decoder is NOT a function of the discrete
code alone — kept as-is for parity (it is a reconstruction-only model).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldm3d.models.layers import Norm, conv3d, conv3d_transpose, upsample3d
from ldm3d.models.quantizers import VectorQuantizerEMASonnet


class _ConvBNRelu(nn.Module):
    features: int
    transpose: bool = False
    batchnorm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = True):
        if self.transpose:
            x = conv3d_transpose(self.features, 4, stride=2,
                                 dtype=self.dtype)(x)
        else:
            x = conv3d(self.features, 4, stride=2, dtype=self.dtype)(x)
        if self.batchnorm:
            x = Norm("batch", dtype=self.dtype)(x, training)
        return jax.nn.relu(x)


class SkipVQEncoder(nn.Module):
    """emavqvae.py:5-59."""

    num_filters: int = 8
    embedding_dim: int = 128
    batchnorm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = True):
        f = self.num_filters
        x1 = _ConvBNRelu(f, batchnorm=self.batchnorm, dtype=self.dtype,
                         name="conv1")(x, training)
        x2 = _ConvBNRelu(f * 2, batchnorm=self.batchnorm, dtype=self.dtype,
                         name="conv2")(x1, training)
        x3 = _ConvBNRelu(f * 4, batchnorm=self.batchnorm, dtype=self.dtype,
                         name="conv3")(x2, training)
        ze = conv3d(self.embedding_dim, 4, stride=2, dtype=self.dtype,
                    name="conv4")(x3)
        return x1, x2, x3, ze


class SkipVQDecoder(nn.Module):
    """emavqvae.py:62-114."""

    out_channels: int = 1
    num_filters: int = 8
    batchnorm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, zq, x1, x2, x3, training: bool = True):
        f = self.num_filters
        h = _ConvBNRelu(f * 4, transpose=True, batchnorm=self.batchnorm,
                        dtype=self.dtype, name="conv1")(zq, training)
        h = jnp.concatenate([x3, h], axis=-1)
        h = _ConvBNRelu(f * 2, transpose=True, batchnorm=self.batchnorm,
                        dtype=self.dtype, name="conv2")(h, training)
        h = jnp.concatenate([x2, h], axis=-1)
        h = _ConvBNRelu(f, transpose=True, batchnorm=self.batchnorm,
                        dtype=self.dtype, name="conv3")(h, training)
        h = jnp.concatenate([x1, h], axis=-1)
        return conv3d_transpose(self.out_channels, 4, stride=2,
                                dtype=self.dtype, name="conv4")(h)


class EMAVQVAE3D(nn.Module):
    """emavqvae_model.py:4-18: returns the reference's output dict
    {'x_out', 'vq_loss', 'perplexity'}."""

    num_channels: int = 1
    num_filters: int = 8
    embedding_dim: int = 32
    num_embeddings: int = 512
    batchnorm: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = SkipVQEncoder(self.num_filters, self.embedding_dim,
                                     batchnorm=True, dtype=self.dtype)
        self.quantization = VectorQuantizerEMASonnet(
            self.num_embeddings, self.embedding_dim)
        self.decoder = SkipVQDecoder(self.num_channels, self.num_filters,
                                     batchnorm=self.batchnorm,
                                     dtype=self.dtype)

    def __call__(self, x, training: bool = True) -> Dict[str, jax.Array]:
        x1, x2, x3, ze = self.encoder(x, training)
        zq, aux = self.quantization(ze, training)
        recon = self.decoder(zq, x1, x2, x3, training)
        return {"x_out": recon, "vq_loss": aux.loss,
                "perplexity": aux.perplexity}


class EMASkipTrainable(EMAVQVAE3D):
    """(recon, aux) interface over EMAVQVAE3D so the skip-connection EMA
    family trains through the standard VQTrainer (the reference's
    main_emavqvae.py is empty — this makes the family actually runnable)."""

    def __call__(self, x, training: bool = True):
        x1, x2, x3, ze = self.encoder(x, training)
        zq, aux = self.quantization(ze, training)
        recon = self.decoder(zq, x1, x2, x3, training)
        return recon, aux


class DoubleConv(nn.Module):
    """emavqvae.py:117-131."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = True):
        for i in range(2):
            x = conv3d(self.features, 3, dtype=self.dtype)(x)
            x = Norm("batch", dtype=self.dtype)(x, training)
            x = jax.nn.relu(x)
        return x


class UNet3DSegment(nn.Module):
    """Generic 3D U-Net (emavqvae_model.py:21-53): 4 maxpool downs, bilinear
    (here nearest) or transpose ups, channel-concat skips."""

    num_channels: int = 1
    num_filters: int = 4
    bilinear: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, training: bool = True):
        f = self.num_filters
        factor = 2 if self.bilinear else 1
        xe1 = DoubleConv(f, dtype=self.dtype, name="inconv")(x, training)

        def down(h, feats, name):
            h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2))
            return DoubleConv(feats, dtype=self.dtype, name=name)(h, training)

        xe2 = down(xe1, f * 2, "down1")
        xe3 = down(xe2, f * 4, "down2")
        xe4 = down(xe3, f * 8, "down3")
        xe5 = down(xe4, f * 16 // factor, "down4")

        def up(h, skip, feats, name):
            if self.bilinear:
                h = upsample3d(h, 2)
            else:
                h = conv3d_transpose(h.shape[-1], 2, stride=2,
                                     dtype=self.dtype)(h)
            h = jnp.concatenate([skip, h], axis=-1)
            return DoubleConv(feats, dtype=self.dtype, name=name)(h, training)

        xd4 = up(xe5, xe4, f * 8 // factor, "up1")
        xd3 = up(xd4, xe3, f * 4 // factor, "up2")
        xd2 = up(xd3, xe2, f * 2 // factor, "up3")
        xd1 = up(xd2, xe1, f, "up4")
        return {"x_out": conv3d(self.num_channels, 1, dtype=self.dtype,
                                name="outconv")(xd1)}
