"""3D diffusion U-Net with time conditioning and optional context
cross-attention.

Parity targets:
  - unconditional factory: reference networks/dm3d.py:294-376
    (stem 64ch, widths [64,128,256], 2 res blocks/level, attention flags,
    res-attn-res middle, 3 res blocks/level up path with skip concat,
    BN-swish-zero-conv head)
  - conditional factory: reference networks/conditional_dm3d.py:324-415
    (stem 32ch, context token -> Embedding(context_dim+1, 4*stem),
    ContextMLP projecting the embedding to each attention site's spatial
    shape, CrossAttentionBlock at attention positions incl. middle)
  - blocks: ResidualBlock dm3d.py:217-252, AttentionBlock dm3d.py:18-63,
    CrossAttentionBlock dm3d.py:66-174, TimeEmbedding dm3d.py:177-191,
    TimeMLP dm3d.py:280-288, Down/UpSample dm3d.py:255-277.

TPU-native: attention runs through the blockwise Pallas voxel-attention
kernel (ldm3d/ops/attention.py) instead of materializing the (h*w*d)^2 score
tensor; everything else is XLA-fused convs.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldm3d.core.config import UNetConfig
from ldm3d.models.layers import Norm, conv3d, upsample3d, variance_scaling_init
from ldm3d.ops.attention import voxel_attention
from ldm3d.parallel.spatial import shard_spatial


class TimeEmbedding(nn.Module):
    """Sinusoidal timestep embedding (reference dm3d.py:177-191)."""

    dim: int
    max_period: int = 10000

    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32)
            * -(math.log(self.max_period) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeMLP(nn.Module):
    """reference dm3d.py:280-288."""

    units: int
    dtype: Any = None

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        t = nn.Dense(self.units, kernel_init=variance_scaling_init(1.0),
                     dtype=self.dtype)(t)
        t = jax.nn.silu(t)
        return nn.Dense(self.units, kernel_init=variance_scaling_init(1.0),
                        dtype=self.dtype)(t)


class ResidualBlock(nn.Module):
    """BN -> swish -> conv3 (+ time-emb broadcast) -> BN -> swish -> zero-init
    conv3, residual add (reference dm3d.py:217-252)."""

    width: int
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array,
                 training: bool = True) -> jax.Array:
        if x.shape[-1] == self.width:
            residual = x
        else:
            residual = conv3d(self.width, 1, dtype=self.dtype,
                              kernel_init=variance_scaling_init(1.0),
                              name="skip_proj")(x)
        t = jax.nn.silu(temb)
        t = nn.Dense(self.width, kernel_init=variance_scaling_init(1.0),
                     dtype=self.dtype, name="temb_proj")(t)
        t = t[:, None, None, None, :]

        h = Norm(self.norm, dtype=self.dtype, name="norm1")(x, training)
        h = jax.nn.silu(h)
        h = conv3d(self.width, 3, dtype=self.dtype,
                   kernel_init=variance_scaling_init(1.0), name="conv1")(h)
        h = h + t
        h = Norm(self.norm, dtype=self.dtype, name="norm2")(h, training)
        h = jax.nn.silu(h)
        h = conv3d(self.width, 3, dtype=self.dtype,
                   kernel_init=variance_scaling_init(0.0), name="conv2")(h)
        return h + residual


class AttentionBlock(nn.Module):
    """Self-attention over the full voxel grid (reference dm3d.py:18-63).

    Matches the reference residual quirk: the skip connection adds the
    *normalized* input, not the raw input (dm3d.py:46,63).
    """

    units: int
    norm: str = "batch"
    impl: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        b, h, w, d, c = x.shape
        xn = Norm(self.norm, dtype=self.dtype, name="norm")(x, training)
        init = variance_scaling_init(1.0)
        q = nn.Dense(self.units, kernel_init=init, dtype=self.dtype,
                     name="query")(xn)
        k = nn.Dense(self.units, kernel_init=init, dtype=self.dtype,
                     name="key")(xn)
        v = nn.Dense(self.units, kernel_init=init, dtype=self.dtype,
                     name="value")(xn)
        seq = h * w * d
        out = voxel_attention(q.reshape(b, seq, self.units),
                              k.reshape(b, seq, self.units),
                              v.reshape(b, seq, self.units),
                              scale=float(self.units) ** -0.5, impl=self.impl)
        out = out.reshape(b, h, w, d, self.units)
        out = nn.Dense(self.units, kernel_init=variance_scaling_init(0.0),
                       dtype=self.dtype, name="proj")(out)
        return xn + out


class CrossAttentionBlock(nn.Module):
    """Self + cross attention + MLP transformer block over voxel sequences
    (reference conditional_dm3d.py:112-221 via dm3d.py:66-174).

    The reference's `v = self.key(context)` (dm3d.py:143) is corrected to use
    the value projection.
    """

    units: int
    num_heads: int = 1
    norm: str = "batch"
    impl: str = "auto"
    dtype: Any = None

    def _attend(self, x_seq: jax.Array, ctx_seq: Optional[jax.Array],
                q_proj, k_proj, v_proj) -> jax.Array:
        b, n, c = x_seq.shape
        src = x_seq if ctx_seq is None else ctx_seq
        q, k, v = q_proj(x_seq), k_proj(src), v_proj(src)
        if self.num_heads > 1:
            hd = self.units // self.num_heads
            def split(t):
                return (t.reshape(b, -1, self.num_heads, hd)
                        .transpose(0, 2, 1, 3)
                        .reshape(b * self.num_heads, -1, hd))
            q, k, v = split(q), split(k), split(v)
        out = voxel_attention(q, k, v, scale=float(self.units) ** -0.5,
                              impl=self.impl)
        if self.num_heads > 1:
            hd = self.units // self.num_heads
            out = (out.reshape(b, self.num_heads, n, hd)
                   .transpose(0, 2, 1, 3).reshape(b, n, self.units))
        return out

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 training: bool = True) -> jax.Array:
        b, h, w, d, c = x.shape
        residual = x
        xn = Norm(self.norm, dtype=self.dtype, name="norm")(x, training)
        xn = conv3d(self.units, 1, dtype=self.dtype, name="proj_in")(xn)
        xn = jax.nn.relu(xn)

        n = h * w * d
        x_seq = xn.reshape(b, n, self.units)
        ctx_seq = context.reshape(b, -1, context.shape[-1])

        q_proj = nn.Dense(self.units, dtype=self.dtype, name="query")
        k_proj = nn.Dense(self.units, dtype=self.dtype, name="key")
        v_proj = nn.Dense(self.units, dtype=self.dtype, name="value")

        n1 = nn.LayerNorm(dtype=self.dtype, name="norm1")(x_seq)
        y = self._attend(n1, None, q_proj, k_proj, v_proj) + x_seq
        n2 = nn.LayerNorm(dtype=self.dtype, name="norm2")(x_seq)
        y = self._attend(n2, ctx_seq, q_proj, k_proj, v_proj) + y
        n3 = nn.LayerNorm(dtype=self.dtype, name="norm3")(x_seq)
        m = nn.Dense(self.units * 4, dtype=self.dtype, name="mlp1")(n3)
        m = jax.nn.relu(m)
        m = nn.Dense(self.units, dtype=self.dtype, name="mlp2")(m)
        y = m + y

        y = y.reshape(b, h, w, d, self.units)
        y = conv3d(self.units, 1, dtype=self.dtype, name="proj_out")(y)
        return jax.nn.relu(y) + residual


class ContextMLP(nn.Module):
    """Projects the context embedding to a full spatial grid
    (reference conditional_dm3d.py:310-318)."""

    spatial: Tuple[int, int, int]
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, cemb: jax.Array) -> jax.Array:
        h, w, d = self.spatial
        out = nn.Dense(h * w * d * self.channels, dtype=self.dtype)(cemb)
        out = jax.nn.silu(out)
        return out.reshape(-1, h, w, d, self.channels)


class UNet3D(nn.Module):
    """The denoiser network; `cfg.context_dim=None` gives the unconditional
    variant (dm3d.py build_model), an int gives the conditional variant
    (conditional_dm3d.py build_model)."""

    cfg: UNetConfig
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array,
                 context: Optional[jax.Array] = None,
                 training: bool = True) -> jax.Array:
        cfg = self.cfg
        conditional = cfg.context_dim is not None
        widths = cfg.widths
        stem = cfg.first_conv_channels

        h = conv3d(stem, 3, dtype=self.dtype,
                   kernel_init=variance_scaling_init(1.0),
                   name="stem")(shard_spatial(x))
        h = shard_spatial(h)
        temb = TimeEmbedding(stem * 4)(t)
        temb = TimeMLP(stem * 4, dtype=self.dtype, name="time_mlp")(temb)

        cemb = None
        if conditional:
            if context is None:
                raise ValueError("conditional UNet requires a context token")
            # +1 extra row = the learned null token for classifier-free
            # guidance (index context_dim + 1) when cfg_dropout is enabled
            n_tokens = cfg.context_dim + 1 + (1 if cfg.cfg_dropout > 0 else 0)
            cemb = nn.Embed(n_tokens, stem * 4, dtype=self.dtype,
                            name="context_embed")(context.astype(jnp.int32))
            if cfg.context_in_time:
                # ADM-style class conditioning: the summed embedding flows
                # through every ResidualBlock's temb_proj, a much stronger
                # injection point than the single-token cross-attention
                # alone (which the trained flagship learned to ignore —
                # reports/quality_r3/context_effect.md). Opt-in; the
                # parameter tree is unchanged, so checkpoints trained
                # either way stay interchangeable.
                temb = temb + cemb.astype(temb.dtype)

        def attend(h, level, site):
            if conditional:
                spatial = h.shape[1:4]
                ctx = ContextMLP(spatial, h.shape[-1], dtype=self.dtype,
                                 name=f"ctx_mlp_{site}")(cemb)
                return CrossAttentionBlock(
                    widths[level] if level >= 0 else widths[-1],
                    num_heads=cfg.num_heads, norm=cfg.norm,
                    impl=cfg.attention_impl, dtype=self.dtype,
                    name=f"xattn_{site}")(h, ctx, training)
            return AttentionBlock(
                widths[level] if level >= 0 else widths[-1], norm=cfg.norm,
                impl=cfg.attention_impl, dtype=self.dtype,
                name=f"attn_{site}")(h, training)

        # Down path (reference dm3d.py:330-345).
        skips = [h]
        for i in range(len(widths)):
            for j in range(cfg.num_res_blocks):
                h = ResidualBlock(widths[i], norm=cfg.norm, dtype=self.dtype,
                                  name=f"down_res_{i}_{j}")(h, temb, training)
                if cfg.has_attention[i]:
                    h = attend(h, i, f"down_{i}_{j}")
                h = shard_spatial(h)
                skips.append(h)
            if widths[i] != widths[-1]:
                h = conv3d(widths[i], 3, stride=2, dtype=self.dtype,
                           kernel_init=variance_scaling_init(1.0),
                           name=f"down_sample_{i}")(h)
                h = shard_spatial(h)
                skips.append(h)

        # Middle (reference dm3d.py:347-354; conditional middle uses
        # cross-attention, conditional_dm3d.py:384-389).
        h = ResidualBlock(widths[-1], norm=cfg.norm, dtype=self.dtype,
                          name="mid_res1")(h, temb, training)
        h = attend(h, -1, "mid")
        h = ResidualBlock(widths[-1], norm=cfg.norm, dtype=self.dtype,
                          name="mid_res2")(h, temb, training)

        # Up path (reference dm3d.py:356-367).
        for i in reversed(range(len(widths))):
            for j in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResidualBlock(widths[i], norm=cfg.norm, dtype=self.dtype,
                                  name=f"up_res_{i}_{j}")(h, temb, training)
                if cfg.has_attention[i]:
                    h = attend(h, i, f"up_{i}_{j}")
                h = shard_spatial(h)
            if i != 0:
                h = upsample3d(h, 2)
                h = conv3d(widths[i], 3, dtype=self.dtype,
                           kernel_init=variance_scaling_init(1.0),
                           name=f"up_sample_{i}")(h)
                h = shard_spatial(h)

        # Head (reference dm3d.py:369-376).
        h = Norm(cfg.norm, dtype=self.dtype, name="head_norm")(h, training)
        h = jax.nn.silu(h)
        h = conv3d(self.out_channels, 3, dtype=self.dtype,
                   kernel_init=variance_scaling_init(0.0), name="head")(h)
        return h
