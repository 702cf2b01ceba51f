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


def _one_volume(key: jax.Array, cls: jax.Array, size: int):
    """One synthetic volume from its per-volume key (the vmapped body of
    `synthetic_batch`, shared by the on-device per-index regenerator).

    `cls` (int32 or bool) selects the class:
      0  healthy brain (low-frequency texture)
      1  focal lesion added at a fixed site ("tumor-like")
      2  high-frequency texture at low amplitude — a distinct spectral
         signature (proxy for a differently-acquired dataset, the way the
         reference's four NIfTI corpora differ globally, dataset_utils.py)
      3  multi-focal: two larger lesions at different fixed sites +
         elongated brain shape
    Classes 0/1 are bit-identical to the original boolean `has_tumor`
    corpus (same PRNG split count and draw order; class-2/3 features are
    deterministic constants selected away by `where`) — existing caches
    and on-device regeneration stay exact. Classes 2/3 exist so conditioning is
    *learnable*: a lesion of ~0.1% of voxels is a near-zero eps-loss
    signal, which made fid_class_sep unmeasurable on the 2-class corpus
    (reports/quality_r4/conditioning_ab.md)."""
    cls = cls.astype(jnp.int32)
    coords = jnp.stack(jnp.meshgrid(
        *[jnp.linspace(-1.0, 1.0, size)] * 3, indexing="ij"), axis=-1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    radii = 0.55 + 0.2 * jax.random.uniform(k1, (3,))
    # class 3: elongated, smaller brain (shape is a global, normalization-
    # proof class signature)
    radii = jnp.where(cls == 3, radii * jnp.array([0.8, 1.15, 0.72]), radii)
    center = 0.1 * jax.random.normal(k2, (3,))
    d = jnp.sum(((coords - center) / radii) ** 2, axis=-1)
    brain = jax.nn.sigmoid((1.0 - d) * 12.0)
    # internal low-frequency structure
    freq = 3.0 + 3.0 * jax.random.uniform(k3, (3,))
    # class 2: ~2.5x the spatial frequency band
    freq = jnp.where(cls == 2, freq * 2.5, freq)
    phase = 2.0 * jnp.pi * jax.random.uniform(k4, (3,))
    tex = (jnp.sin(coords[..., 0] * freq[0] * jnp.pi + phase[0])
           * jnp.sin(coords[..., 1] * freq[1] * jnp.pi + phase[1])
           * jnp.sin(coords[..., 2] * freq[2] * jnp.pi + phase[2]))
    amp = jnp.where(cls == 2, 0.15, 0.3)
    vol = brain * (0.7 + amp * tex)
    lesion_d = jnp.sum(((coords - 0.3) / 0.15) ** 2, axis=-1)
    lesion = jax.nn.sigmoid((1.0 - lesion_d) * 20.0)
    vol = jnp.where(cls == 1, vol + 0.5 * lesion, vol)
    # class 3: two larger lesions at fixed distinct sites
    c3a = jnp.array([-0.35, -0.2, 0.25])
    c3b = jnp.array([0.05, 0.4, -0.3])
    l3 = (jax.nn.sigmoid(
              (1.0 - jnp.sum(((coords - c3a) / 0.22) ** 2, axis=-1)) * 20.0)
          + jax.nn.sigmoid(
              (1.0 - jnp.sum(((coords - c3b) / 0.18) ** 2, axis=-1)) * 20.0))
    vol = jnp.where(cls == 3, vol + 0.45 * l3, vol)
    vol = (vol - vol.min()) / (vol.max() - vol.min() + 1e-8)
    mask = (brain > 0.5).astype(jnp.float32)
    mask = jnp.where(cls == 1, jnp.maximum(mask, lesion > 0.5), mask)
    mask = jnp.where(cls == 3, jnp.maximum(mask, l3 > 0.5), mask)
    return vol[..., None], mask[..., None]


def _batch_classes(rng: jax.Array, batch: int, tumor_fraction: float,
                   num_classes: int) -> jax.Array:
    """Per-volume class labels. num_classes=2 reproduces the original
    boolean tumor draw bit-for-bit; >2 draws uniform classes from the
    same fold_in(rng, 7) stream."""
    u = jax.random.uniform(jax.random.fold_in(rng, 7), (batch,))
    if num_classes == 2:
        return (u < tumor_fraction).astype(jnp.int32)
    return jnp.minimum((u * num_classes).astype(jnp.int32), num_classes - 1)


def synthetic_batch(rng: jax.Array, batch: int, size: int = 128,
                    tumor_fraction: float = 0.5, num_classes: int = 2):
    """Returns (vol [B,S,S,S,1], mask [B,S,S,S,1], context [B] int32)."""
    keys = jax.random.split(rng, batch)
    cls = _batch_classes(rng, batch, tumor_fraction, num_classes)
    vols, masks = jax.vmap(lambda k, c: _one_volume(k, c, size))(keys, cls)
    return vols, masks, cls


def synthetic_volumes_at(root_key: jax.Array, idxs: jax.Array,
                         size: int = 128, gen_batch: int = 8,
                         tumor_fraction: float = 0.5,
                         num_classes: int = 2):
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
        cls = _batch_classes(g, gen_batch, tumor_fraction, num_classes)
        off = idx - group
        vol, mask = _one_volume(keys[off], cls[off], size)
        return vol, mask, cls[off]

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
