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


def _one_volume(key: jax.Array, has_tumor: jax.Array, size: int):
    """One synthetic volume from its per-volume key (the vmapped body of
    `synthetic_batch`, shared by the on-device per-index regenerator)."""
    coords = jnp.stack(jnp.meshgrid(
        *[jnp.linspace(-1.0, 1.0, size)] * 3, indexing="ij"), axis=-1)
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


def synthetic_batch(rng: jax.Array, batch: int, size: int = 128,
                    tumor_fraction: float = 0.5):
    """Returns (vol [B,S,S,S,1], mask [B,S,S,S,1], context [B] int32)."""
    keys = jax.random.split(rng, batch)
    tumor = (jax.random.uniform(jax.random.fold_in(rng, 7), (batch,))
             < tumor_fraction)
    vols, masks = jax.vmap(lambda k, t: _one_volume(k, t, size))(keys, tumor)
    return vols, masks, tumor.astype(jnp.int32)


def synthetic_volumes_at(root_key: jax.Array, idxs: jax.Array,
                         size: int = 128, gen_batch: int = 8,
                         tumor_fraction: float = 0.5):
    """Regenerate specific corpus volumes by index, entirely on device.

    Reproduces `pipeline.write_synthetic_cache(seed)`'s stream exactly
    (which generates in groups of `gen_batch` from
    fold_in(PRNGKey(seed), group_start)), including the cache's f16
    rounding, so a run fed from this function trains on bit-identical
    data to one fed from the cached .npy files — with ZERO host->device
    volume transfers. That is both a TPU-native design point (the input
    pipeline is a compiled program) and the workaround for environments
    whose transfer path retains host buffers.
    """
    def one_at(idx):
        group = (idx // gen_batch) * gen_batch
        g = jax.random.fold_in(root_key, group)
        keys = jax.random.split(g, gen_batch)
        tumor = (jax.random.uniform(jax.random.fold_in(g, 7), (gen_batch,))
                 < tumor_fraction)
        off = idx - group
        vol, mask = _one_volume(keys[off], tumor[off], size)
        return vol, mask, tumor[off].astype(jnp.int32)

    vols, masks, ctx = jax.vmap(one_at)(idxs)
    # match the f16 cache files' rounding so cached and on-device runs
    # are bit-identical
    return (vols.astype(jnp.float16).astype(jnp.float32),
            masks.astype(jnp.float16).astype(jnp.float32), ctx)


def synthetic_dataset(seed: int, num_batches: int, batch: int,
                      size: int = 128):
    """Iterator of synthetic (vol, mask, context) batches."""
    rng = jax.random.PRNGKey(seed)
    for i in range(num_batches):
        yield synthetic_batch(jax.random.fold_in(rng, i), batch, size)
