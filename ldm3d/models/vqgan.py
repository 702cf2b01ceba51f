"""VQ-GAN family: GroupNorm/SiLU autoencoder + dual PatchGAN discriminators.

Parity target is the actively-run variant `vqgan_attn_cp`
(reference networks/vqgan_attn_cp.py, selected by main_exp_vqgan_attn.py:12):
  - pre-norm SiLU residual units with GroupNorm(min(C,32), eps 1e-6)
    (reference :250-277)
  - encoder: k3-s1 stem, then per level k4-s2 down conv + 1 residual unit,
    head GroupNorm + SiLU + 1x1 conv to embedding_dim (reference :279-336)
  - decoder: 1x1 stem + GroupNorm + SiLU, per level k4-s2 transpose conv +
    2 residual units, final k3-s1 conv (reference :339-427)
  - PatchGAN Discriminator3D/2D: k4-s2 conv ladder with BatchNorm +
    LeakyReLU(0.2), conv(ch,4,s1) tail, conv(1,4,s1) head, optional sigmoid,
    returning intermediate features for feature matching (reference :430-566)
  - EMA quantizer between encoder and decoder (ldm3d/models/quantizers.py)

GAN losses (hinge_d_loss / vanilla_d_loss, reference vqgan.py:38-47) live
here; the two-optimizer train step is in ldm3d/train/gan_trainer.py.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldm3d.core.config import DiscriminatorConfig, VQVAEConfig
from ldm3d.models.layers import Norm, conv3d, conv3d_transpose
from ldm3d.models.quantizers import QuantAux, make_quantizer
from ldm3d.parallel.spatial import shard_spatial


class GNResidualUnit(nn.Module):
    """Pre-norm SiLU residual unit (reference vqgan_attn_cp.py:250-277)."""

    channels: int
    res_channels: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        h = Norm("group", dtype=self.dtype, name="norm1")(x, training)
        h = jax.nn.silu(h)
        h = conv3d(self.res_channels, 3, dtype=self.dtype, name="conv1")(h)
        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = Norm("group", dtype=self.dtype, name="norm2")(h, training)
        h = jax.nn.silu(h)
        h = conv3d(self.channels, 3, dtype=self.dtype, name="conv2")(h)
        return x + h


def _gn_res_unit(cfg: VQVAEConfig):
    """GNResidualUnit, rematerialized when cfg.remat (same memory/FLOPs
    trade and remat_policy options as ldm3d/models/vqvae.py::_res_unit)."""
    if cfg.remat:
        from ldm3d.models.vqvae import conv_saveable_policy
        policy = conv_saveable_policy if cfg.remat_policy == "conv" else None
        return nn.remat(GNResidualUnit, static_argnums=(2,), policy=policy)
    return GNResidualUnit


def _vq_res_unit(cfg: VQVAEConfig):
    from ldm3d.models.vqvae import _res_unit
    return _res_unit(cfg)


class VQGANEncoder(nn.Module):
    """reference vqgan_attn_cp.py:279-336."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        cfg = self.cfg
        x = shard_spatial(x)
        for i, ch in enumerate(cfg.num_channels):
            if i == 0:
                x = conv3d(ch, 3, stride=1, dtype=self.dtype,
                           name=f"stem")(x)
            else:
                x = conv3d(ch, 4, stride=2, dtype=self.dtype,
                           name=f"down_{i}")(x)
                x = _gn_res_unit(cfg)(ch, cfg.num_res_channels[i],
                                      dtype=self.dtype, name=f"res_{i}")(
                                          x, training)
            x = shard_spatial(x)
        x = Norm("group", dtype=self.dtype, name="head_norm")(x, training)
        x = jax.nn.silu(x)
        return conv3d(cfg.quantizer.embedding_dim, 1, dtype=self.dtype,
                      name="to_latent")(x)


class VQGANDecoder(nn.Module):
    """reference vqgan_attn_cp.py:339-427."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        cfg = self.cfg
        rev = list(reversed(cfg.num_channels)) + [cfg.out_channels]
        x = shard_spatial(x)
        x = conv3d(rev[0], 1, dtype=self.dtype, name="stem")(x)
        x = Norm("group", dtype=self.dtype, name="stem_norm")(x, training)
        x = jax.nn.silu(x)
        for i in range(1, len(rev)):
            if i == len(rev) - 1:
                x = conv3d(cfg.out_channels, 3, dtype=self.dtype,
                           name="head")(x)
            else:
                x = conv3d_transpose(rev[i], 4, stride=2, dtype=self.dtype,
                                     kernel_resize=cfg.kernel_resize,
                                     name=f"up_{i}")(x)
                x = _gn_res_unit(cfg)(rev[i], rev[i], dtype=self.dtype,
                                      name=f"res_{i}_1")(x, training)
                x = _gn_res_unit(cfg)(rev[i], rev[i], dtype=self.dtype,
                                      name=f"res_{i}_2")(x, training)
            x = shard_spatial(x)
        return x


class SamePadConv3D(nn.Module):
    """SYMMETRIC-pad 'same' conv: mirror-pad k-s per dim, then VALID conv
    (reference networks/vqgan_attn.py:242-265). Differs from zero-pad SAME
    convs at every volume border — the defining trait of the superseded
    `vqgan_attn` family."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ldm3d.models.layers import symmetric_pad3d
        k, s = (self.kernel,) * 3, (self.stride,) * 3
        x = symmetric_pad3d(x, k, s)
        return nn.Conv(self.features, k, strides=s, padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype,
                       kernel_init=nn.initializers.glorot_uniform(),
                       name="conv")(x)


class SamePadConvTranspose3D(nn.Module):
    """SYMMETRIC-pad transpose conv producing exactly stride*n outputs:
    mirror-pad k-s per dim, VALID transpose conv, center-crop the
    (k-s)*(s+1) excess voxels per dim.

    Documented divergence: the reference layer
    (networks/vqgan_attn.py:270-294) omits the crop, so its VALID
    transpose on the padded input yields s*n + (k-s)*(s+1) voxels — a
    128^3 volume decodes to 134^3 and the reconstruction loss cannot even
    be formed, which is why the family was superseded by `vqgan_attn_cp`
    upstream. The crop restores the VideoGPT SamePadConvTranspose3d
    semantics (torch `padding=k-1`) the TF translation dropped."""

    features: int
    kernel: int = 4
    stride: int = 2
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ldm3d.models.layers import symmetric_pad3d
        k, s = (self.kernel,) * 3, (self.stride,) * 3
        x = symmetric_pad3d(x, k, s)
        x = nn.ConvTranspose(self.features, k, strides=s, padding="VALID",
                             use_bias=self.use_bias, dtype=self.dtype,
                             kernel_init=nn.initializers.glorot_uniform(),
                             name="convt", transpose_kernel=True)(x)
        # VALID transpose on the padded input overshoots stride*n by
        # (k-s)*(s+1) per dim; center-crop back (== torch padding=k-1 for
        # the family's k=4,s=2 case)
        e = (self.kernel - self.stride) * (self.stride + 1)
        lo, hi = e // 2, e - e // 2
        if e:
            x = x[:, lo:-hi, lo:-hi, lo:-hi, :]
        return x


class SymResidualUnit(nn.Module):
    """Pre-norm SiLU residual unit with SYMMETRIC-pad convs and a 1x1
    shortcut on channel change (reference networks/vqgan_attn.py:305-338)."""

    channels: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        shortcut = x
        h = Norm("group", dtype=self.dtype, name="norm1")(x, training)
        h = jax.nn.silu(h)
        h = SamePadConv3D(self.channels, 3, dtype=self.dtype,
                          name="conv1")(h)
        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = Norm("group", dtype=self.dtype, name="norm2")(h, training)
        h = jax.nn.silu(h)
        h = SamePadConv3D(self.channels, 3, dtype=self.dtype, name="conv2")(h)
        if shortcut.shape[-1] != self.channels:
            shortcut = SamePadConv3D(self.channels, 1, dtype=self.dtype,
                                     name="shortcut")(shortcut)
        return h + shortcut


class AttnEncoder(nn.Module):
    """SYMMETRIC-pad encoder (reference networks/vqgan_attn.py:340-376 with
    the hard-coded wiring of :584-594): k3-s1 stem at num_channels[0], then
    per level k4-s2 SamePadConv3D doubling channels + one residual unit,
    head GroupNorm + SiLU, and the pre-VQ 1x1 projection to embedding_dim
    (the reference's `pre_vq_conv`; a 1x1x1 conv3d is numerically identical
    to its Conv2D-on-5D-input form)."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        cfg = self.cfg
        x = shard_spatial(x)
        x = SamePadConv3D(cfg.num_channels[0], 3, dtype=self.dtype,
                          name="stem")(x)
        for i, ch in enumerate(cfg.num_channels[1:], start=1):
            x = SamePadConv3D(ch, 4, stride=2, dtype=self.dtype,
                              name=f"down_{i}")(x)
            x = SymResidualUnit(ch, dropout=cfg.dropout, dtype=self.dtype,
                                name=f"res_{i}")(x, training)
            x = shard_spatial(x)
        x = Norm("group", dtype=self.dtype, name="head_norm")(x, training)
        x = jax.nn.silu(x)
        return conv3d(cfg.quantizer.embedding_dim, 1, dtype=self.dtype,
                      name="to_latent")(x)


class AttnDecoder(nn.Module):
    """SYMMETRIC-pad decoder (reference networks/vqgan_attn.py:379-412):
    post-VQ 1x1, GroupNorm + SiLU, per level k4-s2 SamePadConvTranspose3D +
    two residual units, k3-s1 SamePadConv3D head to out_channels."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        cfg = self.cfg
        rev = list(reversed(cfg.num_channels))
        x = shard_spatial(x)
        x = conv3d(cfg.quantizer.embedding_dim, 1, dtype=self.dtype,
                   name="post_vq")(x)
        x = Norm("group", dtype=self.dtype, name="stem_norm")(x, training)
        x = jax.nn.silu(x)
        for i, ch in enumerate(rev[1:], start=1):
            x = SamePadConvTranspose3D(ch, 4, stride=2, dtype=self.dtype,
                                       name=f"up_{i}")(x)
            x = SymResidualUnit(ch, dropout=cfg.dropout, dtype=self.dtype,
                                name=f"res_{i}_1")(x, training)
            x = SymResidualUnit(ch, dropout=cfg.dropout, dtype=self.dtype,
                                name=f"res_{i}_2")(x, training)
            x = shard_spatial(x)
        return SamePadConv3D(cfg.out_channels, 3, dtype=self.dtype,
                             name="head")(x)


class StrideEncoder(nn.Module):
    """'stride' variant encoder: residual units BEFORE each conv, conv
    stride 1, downsampling by AveragePooling3D(2)
    (reference vqgan_stride.py:323-340 with the runner's stride-1 params,
    main_exp_vqgan_stride.py:26-27)."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        from ldm3d.models.layers import act_layer, avgpool3d
        cfg = self.cfg
        for i, ch in enumerate(cfg.num_channels):
            for j in range(cfg.num_res_layers):
                in_ch = x.shape[-1]
                x = _vq_res_unit(cfg)(in_ch, cfg.num_res_channels[i],
                                      act=cfg.act, norm=cfg.norm,
                                      dtype=self.dtype,
                                      name=f"res_{i}_{j}")(x, training)
            x = conv3d(ch, 4, stride=1, dtype=self.dtype,
                       name=f"conv_{i}")(x)
            x = act_layer(cfg.act, self.dtype, f"act_{i}")(x)
            x = avgpool3d(x, 2)
        return conv3d(cfg.quantizer.embedding_dim, 3, dtype=self.dtype,
                      name="to_latent")(x)


class StrideDecoder(nn.Module):
    """'stride' variant decoder: UpSampling3D(2) + conv instead of transpose
    convs (reference vqgan_stride.py:454)."""

    cfg: VQVAEConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        from ldm3d.models.layers import act_layer, upsample3d
        cfg = self.cfg
        rev = list(reversed(cfg.num_channels))
        rev_res = list(reversed(cfg.num_res_channels))
        x = conv3d(rev[0], 3, dtype=self.dtype, name="stem")(x)
        for i in range(len(rev)):
            for j in range(cfg.num_res_layers):
                x = _vq_res_unit(cfg)(rev[i], rev_res[i], act=cfg.act,
                                      norm=cfg.norm, dtype=self.dtype,
                                      name=f"res_{i}_{j}")(x, training)
            x = upsample3d(x, 2)
            out_ch = cfg.out_channels if i == len(rev) - 1 else rev[i + 1] \
                if i + 1 < len(rev) else cfg.out_channels
            x = conv3d(out_ch, 4, stride=1, dtype=self.dtype,
                       name=f"conv_{i}")(x)
            if i != len(rev) - 1:
                x = act_layer(cfg.act, self.dtype, f"act_{i}")(x)
        return x


class Discriminator3D(nn.Module):
    """PatchGAN over volumes (reference vqgan_attn_cp.py:430-497)."""

    cfg: DiscriminatorConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        feats = []
        for i, ch in enumerate(self.cfg.num_channels):
            x = conv3d(ch, 4, stride=2, dtype=self.dtype,
                       name=f"down_{i}")(x)
            if i > 0:
                x = Norm("batch", dtype=self.dtype,
                         name=f"norm_{i}")(x, training)
            x = jax.nn.leaky_relu(x, 0.2)
            feats.append(x)
        x = conv3d(self.cfg.num_channels[-1], 4, stride=1, dtype=self.dtype,
                   name="tail")(x)
        x = Norm("batch", dtype=self.dtype, name="tail_norm")(x, training)
        x = jax.nn.leaky_relu(x, 0.2)
        feats.append(x)
        if self.cfg.head == "dense":
            # gnorm/baseline variant: flatten -> Dense stack head
            # (reference vqgan_gnorm.py:523-536)
            h = x.reshape(x.shape[0], -1)
            h = nn.Dense(64, dtype=self.dtype, name="dense1")(h)
            h = jax.nn.leaky_relu(h, 0.2)
            logits = nn.Dense(1, dtype=self.dtype, name="dense2")(h)
        else:
            logits = conv3d(1, 4, stride=1, dtype=self.dtype, name="head")(x)
        if self.cfg.use_sigmoid:
            logits = jax.nn.sigmoid(logits)
        feats.append(logits)
        return logits, (feats if self.cfg.get_interm_feat else [])


class Discriminator2D(nn.Module):
    """PatchGAN over 2D frames (reference vqgan_attn_cp.py:499-566)."""

    cfg: DiscriminatorConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        feats = []
        for i, ch in enumerate(self.cfg.num_channels):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"down_{i}")(x)
            if i > 0:
                x = Norm("batch", dtype=self.dtype,
                         name=f"norm_{i}")(x, training)
            x = jax.nn.leaky_relu(x, 0.2)
            feats.append(x)
        x = nn.Conv(self.cfg.num_channels[-1], (4, 4), padding="SAME",
                    dtype=self.dtype, name="tail")(x)
        x = Norm("batch", dtype=self.dtype, name="tail_norm")(x, training)
        x = jax.nn.leaky_relu(x, 0.2)
        feats.append(x)
        logits = nn.Conv(1, (4, 4), padding="SAME", dtype=self.dtype,
                         name="head")(x)
        if self.cfg.use_sigmoid:
            logits = jax.nn.sigmoid(logits)
        feats.append(logits)
        return logits, (feats if self.cfg.get_interm_feat else [])


class VQGANAutoencoder(nn.Module):
    """Encoder -> quantizer -> decoder (generator side). The architecture
    family comes from cfg.arch: 'attn_cp' (GroupNorm/SiLU), 'monai'
    (vqgan.py/vqgan_gnorm.py: the MONAI autoencoder of models/vqvae.py with
    the configured norm/act), 'stride' (avgpool/upsample), or 'attn'
    (SYMMETRIC-pad SamePadConv3D family, vqgan_attn.py)."""

    cfg: VQVAEConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        if self.cfg.arch == "monai":
            from ldm3d.models.vqvae import Decoder, Encoder
            self.encoder = Encoder(self.cfg, dtype=self.dtype)
            self.decoder = Decoder(self.cfg, dtype=self.dtype)
        elif self.cfg.arch == "stride":
            self.encoder = StrideEncoder(self.cfg, dtype=self.dtype)
            self.decoder = StrideDecoder(self.cfg, dtype=self.dtype)
        elif self.cfg.arch == "attn":
            self.encoder = AttnEncoder(self.cfg, dtype=self.dtype)
            self.decoder = AttnDecoder(self.cfg, dtype=self.dtype)
        else:
            self.encoder = VQGANEncoder(self.cfg, dtype=self.dtype)
            self.decoder = VQGANDecoder(self.cfg, dtype=self.dtype)
        self.quantizer = make_quantizer(self.cfg.quantizer)

    def __call__(self, x: jax.Array,
                 training: bool = True) -> Tuple[jax.Array, QuantAux]:
        z = self.encoder(x, training)
        q, aux = self.quantizer(z, training)
        return self.decoder(q, training), aux

    def encode_quantize(self, x, training: bool = False):
        return self.quantizer(self.encoder(x, training), training)

    def decode(self, z, training: bool = False):
        return self.decoder(z, training)


# -- GAN losses (reference vqgan.py:38-47) ---------------------------------


def hinge_d_loss(target_ones: bool, logits: jax.Array) -> jax.Array:
    if target_ones:   # real
        return jnp.mean(jax.nn.relu(1.0 - logits))
    return jnp.mean(jax.nn.relu(1.0 + logits))


def vanilla_d_loss(target_ones: bool, logits: jax.Array) -> jax.Array:
    labels = jnp.ones_like(logits) if target_ones else jnp.zeros_like(logits)
    return jnp.mean(optax_sigmoid_ce(logits, labels))


def optax_sigmoid_ce(logits, labels):
    # stable sigmoid cross-entropy (tf.nn.sigmoid_cross_entropy_with_logits)
    zeros = jnp.zeros_like(logits)
    cond = logits >= zeros
    relu_logits = jnp.where(cond, logits, zeros)
    neg_abs = jnp.where(cond, -logits, logits)
    return relu_logits - logits * labels + jnp.log1p(jnp.exp(neg_abs))


def adopt_weight(weight: float, epoch: jax.Array,
                 threshold: int) -> jax.Array:
    """Zero the adversarial weight before `threshold` epochs
    (reference vqgan.py:32-35 + epoch_counter gating :718-720)."""
    return jnp.where(epoch >= threshold, weight, 0.0)
