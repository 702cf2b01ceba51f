"""MONAI-style 3D VQ-VAE — the stage-1 workhorse autoencoder.

Architecture parity with reference networks/vqvae3d_monai.py:218-547:
  - Encoder: per level Conv3D(stride 2, k 4, 'same') + ReLU + N residual
    units, final Conv3D(embedding_dim, 3) + PReLU (reference :237-306).
  - Residual unit: Conv3D(res_ch,3)+act -> Conv3D(in_ch,3)+BN+PReLU, ReLU on
    the skip sum (reference :218-234).
  - Decoder: stem Conv3D(3)+PReLU, then per level N residual units +
    Conv3DTranspose(k 4, stride 2, optional ICNR init) with ReLU between
    levels (reference :309-391).

TPU-native differences: channels-last convs compiled by XLA onto the MXU,
bfloat16 compute with float32 params, and the quantizer state carried in
explicit variable collections (see ldm3d/models/quantizers.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldm3d.core.config import VQVAEConfig
from ldm3d.models.layers import (
    Norm, PReLU, act_layer, conv3d, conv3d_transpose)
from ldm3d.models.quantizers import QuantAux, make_quantizer
from ldm3d.parallel.spatial import shard_spatial


class VQVAEResidualUnit(nn.Module):
    """reference networks/vqvae3d_monai.py:218-234."""

    input_channels: int
    num_res_channels: int
    act: str = "relu"
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        act = act_layer(self.act, self.dtype, "act1")
        h = conv3d(self.num_res_channels, 3, dtype=self.dtype, name="conv1")(x)
        h = act(h)
        h = conv3d(self.input_channels, 3, dtype=self.dtype, name="conv2")(h)
        h = Norm(self.norm, dtype=self.dtype, name="norm")(h, training)
        h = PReLU(dtype=self.dtype, name="prelu")(h)
        return jax.nn.relu(x + h)


def conv_saveable_policy(prim, *_, **__) -> bool:
    """jax.checkpoint policy: keep convolution outputs resident, recompute
    only the cheap elementwise tail (norm/act) in the backward pass. 3D
    convs are the MXU-heavy ops here, so full remat's re-execution of them
    is most of its FLOPs overhead; this policy trades a little HBM for
    that compute back (VERDICT r2 next-6 remat-policy lever)."""
    return getattr(prim, "name", "") == "conv_general_dilated"


def _res_unit(cfg: VQVAEConfig):
    """VQVAEResidualUnit, optionally rematerialized: with cfg.remat the
    unit's activations are recomputed in the backward pass instead of held
    in HBM for the whole step — the jax.checkpoint memory/FLOPs trade that
    lifts the 128^3 per-chip batch ceiling. cfg.remat_policy="conv"
    selects the conv-saveable policy above instead of full recompute."""
    if cfg.remat:
        policy = conv_saveable_policy if cfg.remat_policy == "conv" else None
        return nn.remat(VQVAEResidualUnit, static_argnums=(2,),
                        policy=policy)
    return VQVAEResidualUnit


def space_to_depth3d(x: jax.Array, r: int = 2) -> jax.Array:
    """[B, D, H, W, C] -> [B, D/r, H/r, W/r, r^3*C], parity-major channel
    order (qd, qh, qw, c). Pure reshape/transpose — XLA lowers it to a
    layout change, no compute."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // r, r, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // r, h // r, w // r, r * r * r * c)


class S2DStemConv(nn.Module):
    """Space-to-depth stem: the exact function class of a k4-s2 SAME conv,
    reparameterized as zero-pad(1,1) -> space-to-depth(2) -> k2-s1 VALID
    conv. TPU lever for the thin-channel padding gap (VERDICT r3 next-5):
    the 2-channel 128^3 input becomes 16-channel 64^3, filling vector
    lanes 8x better and cutting the stem's im2col window from 64 taps to 8.

    Exactness: SAME k4-s2 output position m reads padded input 2m..2m+3;
    with parities x_q[t] = xp[2t+q] that window is {(t', q): u = 2t'+q},
    a bijection onto the k2 window over 8x channels — so any k4-s2 kernel
    w maps to w2[t', (q, c), o] = w[2t'+q, c, o] and conversely
    (tests/test_s2d_stem.py pins bit-level equivalence both ways)."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert all(s % 2 == 0 for s in x.shape[1:4]), \
            "S2DStemConv requires even spatial dims (SAME k4-s2 parity)"
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        x = space_to_depth3d(x, 2)
        return nn.Conv(self.features, (2, 2, 2), padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype,
                       kernel_init=nn.initializers.glorot_uniform(),
                       name="conv")(x)


class Encoder(nn.Module):
    """reference networks/vqvae3d_monai.py:237-306."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        cfg = self.cfg
        x = shard_spatial(x)
        for i, ch in enumerate(cfg.num_channels):
            if (i == 0 and cfg.stem_s2d and cfg.downsample_kernel[0] == 4
                    and cfg.downsample_stride[0] == 2):
                x = S2DStemConv(ch, dtype=self.dtype, name="down_0")(x)
            else:
                x = conv3d(ch, cfg.downsample_kernel[i],
                           stride=cfg.downsample_stride[i], dtype=self.dtype,
                           name=f"down_{i}")(x)
            x = shard_spatial(x)
            if i > 0 and cfg.dropout:
                x = nn.Dropout(cfg.dropout, deterministic=not training)(x)
            x = jax.nn.relu(x)
            for j in range(cfg.num_res_layers):
                x = _res_unit(cfg)(
                    ch, cfg.num_res_channels[i], act=cfg.act, norm=cfg.norm,
                    dtype=self.dtype, name=f"res_{i}_{j}")(x, training)
                x = shard_spatial(x)
        x = conv3d(cfg.quantizer.embedding_dim, 3, dtype=self.dtype,
                   name="to_latent")(x)
        if cfg.dropout:
            x = nn.Dropout(cfg.dropout, deterministic=not training)(x)
        x = PReLU(dtype=self.dtype, name="latent_prelu")(x)
        return x


class Decoder(nn.Module):
    """reference networks/vqvae3d_monai.py:309-391."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        cfg = self.cfg
        rev_channels = list(reversed(cfg.num_channels))
        rev_res_channels = list(reversed(cfg.num_res_channels))

        x = shard_spatial(x)
        x = conv3d(rev_channels[0], 3, dtype=self.dtype, name="stem")(x)
        if cfg.dropout:
            x = nn.Dropout(cfg.dropout, deterministic=not training)(x)
        x = PReLU(dtype=self.dtype, name="stem_prelu")(x)

        n = len(rev_channels)
        for i in range(n):
            for j in range(cfg.num_res_layers):
                x = _res_unit(cfg)(
                    rev_channels[i], rev_res_channels[i], act=cfg.act,
                    norm=cfg.norm, dtype=self.dtype,
                    name=f"res_{i}_{j}")(x, training)
                x = shard_spatial(x)
            out_ch = cfg.out_channels if i == n - 1 else rev_channels[i + 1]
            x = conv3d_transpose(
                out_ch, cfg.upsample_kernel[n - 1 - i],
                stride=cfg.upsample_stride[n - 1 - i],
                kernel_resize=cfg.kernel_resize, dtype=self.dtype,
                name=f"up_{i}")(x)
            x = shard_spatial(x)
            if i != n - 1:
                if cfg.dropout:
                    x = nn.Dropout(cfg.dropout, deterministic=not training)(x)
                x = jax.nn.relu(x)
        if cfg.output_act:
            x = act_layer(cfg.output_act, self.dtype, "output_act")(x)
        return x


class VQVAE(nn.Module):
    """End-to-end encoder -> quantizer -> decoder
    (reference networks/vqvae3d_monai.py:394-463)."""

    cfg: VQVAEConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quantizer = make_quantizer(self.cfg.quantizer)

    def __call__(self, x: jax.Array,
                 training: bool = True) -> Tuple[jax.Array, QuantAux]:
        z = self.encoder(x, training)
        quantized, aux = self.quantizer(z, training)
        recon = self.decoder(quantized, training)
        return recon, aux

    def encode(self, x: jax.Array, training: bool = False) -> jax.Array:
        return self.encoder(x, training)

    def encode_quantize(self, x: jax.Array, training: bool = False):
        z = self.encoder(x, training)
        return self.quantizer(z, training)

    def decode(self, z: jax.Array, training: bool = False) -> jax.Array:
        return self.decoder(z, training)
