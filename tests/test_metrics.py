"""SSIM/PSNR metric math (reference vqvae3d_monai.py:523-536 uses
tf.image.ssim/psnr per coronal slice; ldm3d/ops/metrics.py reimplements
the same gaussian-window math).

Regression: on TPU the gaussian-filter convs defaulted to bf16 passes, so
the windowed variance E[x^2]-mu^2 went negative and logged val_ssim > 1
(observed 2.21 in the round-2 convergence run). The kernel now runs at
HIGHEST precision with variances clamped at 0; SSIM must stay in [-1, 1].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.ops.metrics import ssim2d, volume_psnr, volume_ssim


def _vols(key, b=2, s=32):
    ka, kb = jax.random.split(key)
    a = jax.random.uniform(ka, (b, s, s, s, 1))
    n = 0.05 * jax.random.normal(kb, a.shape)
    return a, jnp.clip(a + n, 0.0, 1.0)


def test_ssim_identity_is_one():
    a, _ = _vols(jax.random.PRNGKey(0))
    assert float(volume_ssim(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_bounded_and_noise_monotone():
    a, b = _vols(jax.random.PRNGKey(1))
    s_near = float(volume_ssim(b, a))
    far = jnp.clip(a + 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                               a.shape), 0.0, 1.0)
    s_far = float(volume_ssim(far, a))
    assert -1.0 <= s_far < s_near <= 1.0


def test_ssim_low_precision_inputs_stay_bounded():
    # bf16 inputs previously fed bf16 accumulation; now cast up at entry
    a, b = _vols(jax.random.PRNGKey(3))
    s16 = float(volume_ssim(b.astype(jnp.bfloat16),
                            a.astype(jnp.bfloat16)))
    s32 = float(volume_ssim(b, a))
    assert abs(s16 - s32) < 0.02 and s16 <= 1.0


def test_ssim2d_variance_clamp_tiny_range():
    # near-constant images: windowed variance is pure rounding error;
    # without the clamp the cs term can exceed 1
    x = jnp.full((1, 32, 32), 0.5) + 1e-4 * jax.random.normal(
        jax.random.PRNGKey(4), (1, 32, 32))
    s = float(jnp.mean(ssim2d(x, x, jnp.asarray(1.0))))
    assert s == pytest.approx(1.0, abs=1e-4)


def test_psnr_matches_direct_formula():
    a, b = _vols(jax.random.PRNGKey(5), b=1)
    got = float(volume_psnr(b, a))
    va, vb = np.asarray(a[0, ..., 0]), np.asarray(b[0, ..., 0])
    max_val = va.max() - va.min()
    mse = np.mean((va - vb) ** 2, axis=(1, 2))  # per coronal slice
    want = np.mean(20 * np.log10(max_val) - 10 * np.log10(mse))
    assert got == pytest.approx(want, rel=1e-4)
