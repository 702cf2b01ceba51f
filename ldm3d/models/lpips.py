"""LPIPS perceptual metric, on-device.

Parity with reference models/lpips_tensorflow.py:
  - VGG16 feature taps at block{1..5} last conv (reference :114-125)
  - input preprocess shift/scale (reference :9-17)
  - channel-unit-normalize, squared diff, 1x1 linear heads (no bias),
    spatial mean, sum over layers (reference :20-63, :164-181)

Unlike the reference (a separate TF/Keras VGG16 with downloaded ImageNet
weights, loaded from ./models/vgg + ./models/lin checkpoints,
vqgan_attn_cp.py:654-658), this VGG runs inside the same jitted XLA program
as the GAN train step. Pretrained weights can be supplied as a .npz via
`load_lpips_params` (this environment has no network egress, so the default
is the deterministic random init — architecture and wiring are identical and
checkpoint-compatible)."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (channels, convs per block)
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the 5 LPIPS feature taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"block{bi + 1}_conv{ci + 1}")(x)
                x = jax.nn.relu(x)
            feats.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """learned_perceptual_metric_model equivalent: d(img1, img2) -> [N]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        net = VGG16Features(dtype=self.dtype, name="vgg")
        f1 = net((img1 - shift) / scale)
        f2 = net((img2 - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            a = a * jax.lax.rsqrt(
                jnp.sum(jnp.square(a), axis=-1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(
                jnp.sum(jnp.square(b), axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(a - b)
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.constant(0.1),
                          name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def calibrate_lpips_params(params: Dict, frame_hw, seed: int = 0,
                           num_samples: int = 8) -> Dict:
    """Deterministic self-calibration of the random-feature LPIPS surrogate.

    When no pretrained VGG16/linear-head weights are available (this
    environment has no egress; the reference loads them from ./models/vgg +
    ./models/lin, models/lpips_tensorflow.py:114-181), the VGG trunk stays
    at its seeded random init — random-network LPIPS is a serviceable
    perceptual basis (Zhang et al. 2018, Sec. 5: untrained nets score far
    above plain L2) — but the raw per-layer contributions are then badly
    unbalanced: deep 512-channel taps can dominate shallow ones by orders
    of magnitude. This rescales each 1x1 linear head so every tap
    contributes equally in expectation over MRI-like distorted frame
    pairs, and the total distance is O(1) on a typical distortion.

    Pure function: returns a new params tree; deterministic given `seed`.
    """
    h, w = frame_hw
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)

    # smooth MRI-like base frames: blurred noise, in [0, 1]
    base = jax.random.uniform(k1, (num_samples, h // 4, w // 4, 1))
    base = jax.image.resize(base, (num_samples, h, w, 1), "bilinear")
    # distorted partners: brightness shift + additive noise
    gain = 1.0 + 0.2 * jax.random.normal(k2, (num_samples, 1, 1, 1))
    noise = 0.05 * jax.random.normal(k3, base.shape)
    dist = jnp.clip(base * gain + noise, 0.0, 1.0)
    img1 = jnp.tile(base, (1, 1, 1, 3))
    img2 = jnp.tile(dist, (1, 1, 1, 3))

    shift = jnp.asarray(_SHIFT, jnp.float32)
    scale = jnp.asarray(_SCALE, jnp.float32)
    vgg = VGG16Features(dtype=jnp.float32)
    f1 = vgg.apply({"params": params["vgg"]}, (img1 - shift) / scale)
    f2 = vgg.apply({"params": params["vgg"]}, (img2 - shift) / scale)

    new_params = dict(params)
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a * jax.lax.rsqrt(
            jnp.sum(jnp.square(a), axis=-1, keepdims=True) + 1e-10)
        b = b * jax.lax.rsqrt(
            jnp.sum(jnp.square(b), axis=-1, keepdims=True) + 1e-10)
        # expected per-layer contribution with a unit (all-ones) head
        layer_mean = float(jnp.mean(jnp.sum(jnp.square(a - b), axis=-1)))
        target = 1.0 / len(f1)  # each tap contributes 1/5 of a unit total
        gain_i = target / max(layer_mean, 1e-12)
        lin = dict(new_params[f"lin{i}"])
        ones = jnp.ones_like(lin["kernel"])
        lin["kernel"] = ones * gain_i
        new_params[f"lin{i}"] = lin
    return new_params


def load_lpips_params(path: Optional[str] = None) -> Optional[Dict]:
    """Load converted VGG16+linear-head weights from an .npz of flat
    'path/to/param' -> array entries (produced offline from the torch/TF
    reference weights). Returns None if unavailable."""
    path = path or os.environ.get("LDM3D_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree
