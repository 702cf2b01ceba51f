"""Shared 3D building blocks: TF-'same'-semantics convolutions, ICNR
transpose-conv init, per-channel PReLU, and norm selection.

All volumes use channels-last [B, H, W, D, C] layout, matching both the
reference's Keras convention and XLA-TPU's preferred conv layout; convs lower
to `lax.conv_general_dilated` with ('NDHWC','DHWIO','NDHWC') numbers, which
XLA tiles onto the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def icnr_init(base_init: Callable, scale: int = 2) -> Callable:
    """ICNR initializer for checkerboard-free transpose convolutions.

    Functional equivalent of the reference's host-side ICNR (reference:
    networks/vqvae3d_monai.py:69-97: init a kernel at 1/scale spatial size,
    then trilinearly reslice up). Implemented with jax.image.resize so it runs
    at init time on device with no dipy dependency.

    Kernel layout is flax DHWIO: (kd, kh, kw, in, out).
    """

    def init(key, shape, dtype=jnp.float32):
        if scale == 1:
            return base_init(key, shape, dtype)
        kd, kh, kw, ci, co = shape
        small = base_init(
            key, (max(kd // scale, 1), max(kh // scale, 1), max(kw // scale, 1),
                  ci, co), dtype)
        return jax.image.resize(small, shape, method="trilinear")

    return init


class PReLU(nn.Module):
    """Per-channel parametric ReLU.

    The reference's Keras `PReLU()` default learns one alpha per *voxel*
    (shape = full spatial grid x channels) — an accidental O(128^3 * C)
    parameter blob. Here alpha is per-channel (Keras `shared_axes` on the
    spatial dims), the standard parameterization.
    """

    negative_slope_init: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", nn.initializers.constant(self.negative_slope_init),
            (x.shape[-1],))
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def act_layer(name: Optional[str], dtype: Optional[Dtype] = None,
              layer_name: Optional[str] = None
              ) -> Callable[[jax.Array], jax.Array]:
    """Activation usable inside `nn.compact`: unlike `get_act` it also
    supports "prelu", returned as a learnable `PReLU` module — the
    reference's default activation for the VQGAN encoder/decoder
    (reference networks/vqgan.py:650-652 `act_fn='prelu'`)."""
    if name == "prelu":
        return PReLU(dtype=dtype, name=layer_name)
    return get_act(name)


def get_act(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    if name is None:
        return lambda x: x
    return {
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "siren": jnp.sin,  # SIRENActivation (reference vqgan.py:23-29)
    }[name]


class Norm(nn.Module):
    """Norm selector: the reference mixes BatchNorm (vqvae3d_monai, dm3d) and
    GroupNorm(min(C,32), eps=1e-6) (vqgan_attn_cp) — both supported so the
    architecture families stay parity-comparable (SURVEY.md §7 hard part 4)."""

    kind: str = "batch"          # "batch" | "group" | "layer" | "none"
    num_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = True) -> jax.Array:
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype)(x)
        if self.kind == "group":
            groups = min(x.shape[-1], self.num_groups)
            return nn.GroupNorm(num_groups=groups, epsilon=1e-6,
                                dtype=self.dtype)(x)
        if self.kind == "layer":
            return nn.LayerNorm(dtype=self.dtype)(x)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm kind {self.kind}")


def symmetric_pad3d(x: jax.Array, kernel: Tuple[int, int, int],
                    stride: Tuple[int, int, int]) -> jax.Array:
    """Edge-inclusive mirror padding for a VALID conv, TF semantics:
    `tf.pad(mode='SYMMETRIC')` == `jnp.pad(mode='symmetric')`. Per spatial
    dim the total pad is k - s, split low = p//2, high = p//2 + p%2 —
    the VideoGPT SamePad recipe the reference's superseded `vqgan_attn`
    family uses (reference networks/vqgan_attn.py:242-265)."""
    pads = [(0, 0)]
    for k, s in zip(kernel, stride):
        p = k - s
        pads.append((p // 2, p // 2 + p % 2))
    pads.append((0, 0))
    if all(lo == 0 and hi == 0 for lo, hi in pads):
        return x
    return jnp.pad(x, pads, mode="symmetric")


def conv3d(features: int, kernel: Union[int, Tuple[int, int, int]] = 3,
           stride: Union[int, Tuple[int, int, int]] = 1, dilation: int = 1,
           use_bias: bool = True, dtype=None, name=None,
           kernel_init=None) -> nn.Conv:
    """3D conv with TF 'same' padding semantics (matches Keras Conv3D used
    throughout the reference, e.g. vqvae3d_monai.py:269)."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    return nn.Conv(
        features=features, kernel_size=kernel, strides=stride, padding="SAME",
        kernel_dilation=(dilation,) * 3, use_bias=use_bias, dtype=dtype,
        kernel_init=kernel_init or nn.initializers.glorot_uniform(),
        name=name)


def conv3d_transpose(features: int, kernel: Union[int, Tuple[int, int, int]] = 4,
                     stride: Union[int, Tuple[int, int, int]] = 2,
                     use_bias: bool = True, dtype=None, name=None,
                     kernel_resize: bool = False) -> nn.ConvTranspose:
    """3D transpose conv, TF 'same' semantics: output = input * stride
    (matches Keras Conv3DTranspose, reference vqvae3d_monai.py:372-377).
    `kernel_resize=True` applies the ICNR checkerboard-free init.

    `transpose_kernel=True` is load-bearing for TF parity: Keras
    Conv3DTranspose is the *gradient of the SAME-padded strided
    cross-correlation*, while flax's default lax.conv_transpose is a
    fractionally-strided convolution with an unflipped kernel — the two
    differ in both kernel orientation and SAME-window placement.
    tests/test_tf_parity.py locks this against precomputed TF golden
    values (SURVEY.md §7 hard part 1). Kernel param layout under this
    flag is (kd, kh, kw, OUT, IN)."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    base = nn.initializers.glorot_normal() if kernel_resize \
        else nn.initializers.glorot_uniform()
    init = icnr_init(base, scale=stride[0]) if kernel_resize else base
    return nn.ConvTranspose(
        features=features, kernel_size=kernel, strides=stride, padding="SAME",
        use_bias=use_bias, dtype=dtype, kernel_init=init, name=name,
        transpose_kernel=True)


def upsample3d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour 3D upsample (Keras UpSampling3D, dm3d.py:271)."""
    b, h, w, d, c = x.shape
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    x = jnp.repeat(x, factor, axis=3)
    return x


def avgpool3d(x: jax.Array, window: int = 2) -> jax.Array:
    """AveragePooling3D (reference vqgan_stride.py:323-340)."""
    return nn.avg_pool(x, (window,) * 3, strides=(window,) * 3)


def variance_scaling_init(scale: float):
    """Keras VarianceScaling(scale, fan_avg, uniform) used throughout the
    diffusion U-Net (reference dm3d.py:11-15); scale 0 => zero init."""
    if scale <= 1e-10:
        return nn.initializers.zeros
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")
