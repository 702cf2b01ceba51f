"""Image-quality metrics (SSIM / PSNR) computed on-device.

The reference evaluates 2D SSIM/PSNR per axial slice of each volume with
`tf.image.ssim/psnr` inside `test_step` (reference networks/
vqvae3d_monai.py:523-536: a [H,W,D,1] volume is fed as a batch of H 2D
slices). Same semantics here, fully vectorized: slices along the first
spatial axis, 11x11 Gaussian-window SSIM."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """img: [N, H, W] -> valid-padded gaussian blur."""
    k = kernel[:, :, None, None]  # HWIO
    # HIGHEST: TPU convs default to bf16 passes, which makes the windowed
    # E[x^2] - mu^2 variance estimate go negative and SSIM exceed 1.
    out = jax.lax.conv_general_dilated(
        img[..., None], k.astype(img.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out[..., 0]


def ssim2d(a: jax.Array, b: jax.Array, max_val: jax.Array,
           size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean 2D SSIM over a batch of [N, H, W] images (tf.image.ssim math)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    kernel = jnp.asarray(_gaussian_kernel(size, sigma), a.dtype)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # variances are >= 0 analytically; clamp away residual float error so
    # the cs term stays bounded by 1
    sigma_aa = jnp.maximum(_filter2d(a * a, kernel) - mu_aa, 0.0)
    sigma_bb = jnp.maximum(_filter2d(b * b, kernel) - mu_bb, 0.0)
    sigma_ab = _filter2d(a * b, kernel) - mu_ab
    lum = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    return jnp.mean(lum * cs, axis=(-2, -1))


def volume_ssim(vol_a: jax.Array, vol_b: jax.Array) -> jax.Array:
    """Mean per-slice SSIM of [B, H, W, D, 1] volumes; like the reference,
    max_val is the dynamic range of the second argument per volume."""
    b = vol_a.shape[0]
    a2 = vol_a[..., 0].reshape(b, vol_a.shape[1], -1)
    b2 = vol_b[..., 0].reshape(b, vol_b.shape[1], -1)

    def per_vol(va, vb):
        max_val = jnp.max(vb) - jnp.min(vb)
        # slices along axis 0: [H, W, D] -> treat as H images of [W, D]
        return jnp.mean(ssim2d(va.reshape(va.shape[0], va.shape[1], -1),
                               vb.reshape(vb.shape[0], vb.shape[1], -1),
                               max_val))

    va = vol_a[..., 0]
    vb = vol_b[..., 0]
    return jnp.mean(jax.vmap(per_vol)(va, vb))


def volume_psnr(vol_a: jax.Array, vol_b: jax.Array) -> jax.Array:
    """Mean per-slice PSNR (reference vqvae3d_monai.py:530-536)."""
    def per_vol(va, vb):
        max_val = jnp.max(vb) - jnp.min(vb)
        mse = jnp.mean(jnp.square(va - vb), axis=(1, 2, 3))  # per slice
        return jnp.mean(20.0 * jnp.log10(jnp.maximum(max_val, 1e-12))
                        - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
    return jnp.mean(jax.vmap(per_vol)(vol_a, vol_b))
