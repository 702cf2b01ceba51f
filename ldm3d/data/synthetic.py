"""Synthetic MRI-like volumes for tests and benchmarks.

Stands in for the NIfTI datasets (CC359/NFBS/HCP/BraTS, reference
dataset_utils.py:27-82) when no data is mounted: smooth ellipsoidal "brain"
with internal structure, a binary mask channel, and a context token
(0=healthy, 1=tumor-like lesion added), normalized to [0, 1] exactly like
`load_transform_img` (reference dataset_utils.py:178-188)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_batch(rng: jax.Array, batch: int, size: int = 128,
                    tumor_fraction: float = 0.5):
    """Returns (vol [B,S,S,S,1], mask [B,S,S,S,1], context [B] int32)."""
    keys = jax.random.split(rng, batch)
    tumor = (jax.random.uniform(jax.random.fold_in(rng, 7), (batch,))
             < tumor_fraction)

    coords = jnp.stack(jnp.meshgrid(
        *[jnp.linspace(-1.0, 1.0, size)] * 3, indexing="ij"), axis=-1)

    def one(key, has_tumor):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        radii = 0.55 + 0.2 * jax.random.uniform(k1, (3,))
        center = 0.1 * jax.random.normal(k2, (3,))
        d = jnp.sum(((coords - center) / radii) ** 2, axis=-1)
        brain = jax.nn.sigmoid((1.0 - d) * 12.0)
        # internal low-frequency structure
        freq = 3.0 + 3.0 * jax.random.uniform(k3, (3,))
        phase = 2.0 * jnp.pi * jax.random.uniform(k4, (3,))
        tex = (jnp.sin(coords[..., 0] * freq[0] * jnp.pi + phase[0])
               * jnp.sin(coords[..., 1] * freq[1] * jnp.pi + phase[1])
               * jnp.sin(coords[..., 2] * freq[2] * jnp.pi + phase[2]))
        vol = brain * (0.7 + 0.3 * tex)
        lesion_d = jnp.sum(((coords - 0.3) / 0.15) ** 2, axis=-1)
        lesion = jax.nn.sigmoid((1.0 - lesion_d) * 20.0)
        vol = jnp.where(has_tumor, vol + 0.5 * lesion, vol)
        vol = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)
        mask = (brain > 0.5).astype(jnp.float32)
        mask = jnp.where(has_tumor, jnp.maximum(mask, lesion > 0.5), mask)
        return vol[..., None], mask[..., None]

    vols, masks = jax.vmap(one)(keys, tumor)
    return vols, masks, tumor.astype(jnp.int32)


def synthetic_dataset(seed: int, num_batches: int, batch: int,
                      size: int = 128):
    """Iterator of synthetic (vol, mask, context) batches."""
    rng = jax.random.PRNGKey(seed)
    for i in range(num_batches):
        yield synthetic_batch(jax.random.fold_in(rng, i), batch, size)
