"""Preprocess-once volume cache + host->device input pipeline.

Replaces the reference's `tf.data` assembly (dataset_utils.py:221-282:
numpy_function map + `dataset.save` on-disk cache + versioned loader) with a
framework-neutral cache — one little-endian float16 .npy pair per volume plus
a JSON manifest — and a double-buffered prefetcher that overlaps host IO with
device compute (the reference relies on tf.data AUTOTUNE prefetch).

Augmentation parity (reference dataset_utils.py:116-205): axis-0 flip kept
with probability `flip_chance`, brightness x U(0.9, 1.1), contrast jitter —
applied on device in the batch collate (vectorized jnp) instead of per-file
numpy, so augmented epochs cost no extra host IO.

An optional C++ reader (runtime/dataio.cpp, loaded via ctypes) accelerates
the cache reads with a background thread pool when built; the pipeline falls
back to numpy memmap reads transparently.
"""

from __future__ import annotations

import json
import os
import threading
import queue as queue_mod
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d.core.config import DataConfig

MANIFEST = "manifest.json"


# ---------------------------------------------------------------------------
# Cache construction (the `create_dataset` equivalent)
# ---------------------------------------------------------------------------


def build_cache(cfg: DataConfig, paths: Optional[Sequence[str]] = None,
                verbose: bool = True) -> str:
    """Preprocess NIfTI files once into the cache dir
    (reference create_dataset + dataset.save, dataset_utils.py:221-264)."""
    from ldm3d.data.nifti import get_dataset_list, load_transform_img

    os.makedirs(cfg.cache_dir, exist_ok=True)
    if paths is None:
        paths = get_dataset_list(cfg.dataset, cfg.test_run, cfg.dataset_dir)
    entries = []
    for i, path in enumerate(paths):
        vol, mask, context = load_transform_img(path)
        stem = f"vol_{i:05d}"
        np.save(os.path.join(cfg.cache_dir, stem + "_img.npy"),
                vol.astype(np.float16))
        np.save(os.path.join(cfg.cache_dir, stem + "_mask.npy"),
                mask.astype(np.float16))
        entries.append({"stem": stem, "context": context, "source": path})
        if verbose and (i + 1) % 25 == 0:
            print(f"cached {i + 1}/{len(paths)} volumes")
    with open(os.path.join(cfg.cache_dir, MANIFEST), "w") as f:
        json.dump({"entries": entries, "volume_size": cfg.volume_size}, f)
    return cfg.cache_dir


def write_synthetic_cache(cache_dir: str, num_volumes: int, size: int = 64,
                          seed: int = 0, gen_batch: int = 8,
                          num_classes: int = 2) -> str:
    """Materialize a synthetic cache (for tests/benchmarks without data).

    Volumes are generated in jitted batches of `gen_batch` — one compiled
    program per corpus instead of ~40 eager dispatches per volume, which
    matters when building a convergence-scale corpus (1000+ volumes at
    128^3) through this environment's device relay."""
    import functools

    from ldm3d.data.synthetic import synthetic_batch

    os.makedirs(cache_dir, exist_ok=True)
    entries = []
    rng = jax.random.PRNGKey(seed)
    gen = jax.jit(functools.partial(synthetic_batch, size=size,
                                    num_classes=num_classes),
                  static_argnames=("batch",))
    for start in range(0, num_volumes, gen_batch):
        b = min(gen_batch, num_volumes - start)
        vol, mask, ctx = gen(jax.random.fold_in(rng, start), batch=b)
        vol = np.asarray(vol, np.float16)
        mask = np.asarray(mask, np.float16)
        ctx = np.asarray(ctx)
        for j in range(b):
            stem = f"vol_{start + j:05d}"
            np.save(os.path.join(cache_dir, stem + "_img.npy"), vol[j])
            np.save(os.path.join(cache_dir, stem + "_mask.npy"), mask[j])
            entries.append({"stem": stem, "context": int(ctx[j]),
                            "source": "synthetic"})
    with open(os.path.join(cache_dir, MANIFEST), "w") as f:
        json.dump({"entries": entries, "volume_size": size,
                   "num_classes": num_classes}, f)
    return cache_dir


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------


class VolumeCache:
    """Random-access view over a preprocessed cache directory."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, MANIFEST)) as f:
            manifest = json.load(f)
        self.cache_dir = cache_dir
        self.entries = manifest["entries"]
        self.volume_size = manifest["volume_size"]
        self._reader = _native_reader()

    def __len__(self) -> int:
        return len(self.entries)

    def read(self, idx: int) -> Tuple[np.ndarray, np.ndarray, int]:
        e = self.entries[idx]
        img_path = os.path.join(self.cache_dir, e["stem"] + "_img.npy")
        mask_path = os.path.join(self.cache_dir, e["stem"] + "_mask.npy")
        if self._reader is not None:
            img = self._reader.read_npy(img_path)
            mask = self._reader.read_npy(mask_path)
        else:
            img = np.load(img_path)
            mask = np.load(mask_path)
        return img, mask, e["context"]


def _native_reader():
    try:
        from ldm3d.data.native import NativeReader
        return NativeReader.maybe_create()
    except Exception:
        return None


class DataLoader:
    """Shuffled, batched, host-prefetched loader with device-side
    augmentation."""

    def __init__(self, cache: VolumeCache, batch_size: int, cfg: DataConfig,
                 seed: int = 0, train: bool = True,
                 indices: Optional[Sequence[int]] = None,
                 prefetch: int = 2, mesh=None,
                 spatial_axis: Optional[int] = None):
        self.cache = cache
        self.batch_size = batch_size
        self.cfg = cfg
        self.seed = seed
        self.train = train
        self.indices = list(indices if indices is not None
                            else range(len(cache)))
        self.prefetch = prefetch
        self.mesh = mesh
        self.spatial_axis = spatial_axis
        self._epoch = 0

    def _shardings(self):
        """Batch shardings for (vol, mask, ctx) when a mesh is attached:
        volumes batch-split over 'data' (optionally one spatial axis over
        'space'), contexts over 'data'. This is the TPU-native equivalent
        of the reference's AutoShardPolicy.DATA input pipeline
        (reference main.py:154-173)."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ldm3d.parallel.mesh import DATA_AXIS, batch_sharding
        vol_sh = batch_sharding(self.mesh, self.spatial_axis)
        ctx_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        return vol_sh, ctx_sh

    def __len__(self) -> int:
        return len(self.indices) // self.batch_size

    def _local_rows(self):
        """In multi-process (multi-host) mode, the batch rows this process
        owns under the mesh sharding; None => read the full batch. The
        global shuffle order is seed-identical on every process, so each
        host reads a disjoint slice of the same global batch — per-host
        input sharding over DCN."""
        if self.mesh is None:
            return None
        import jax
        if jax.process_count() == 1:
            return None
        from ldm3d.parallel.distributed import local_batch_rows
        vol_sh, _ = self._shardings()
        s = self.cache.volume_size
        return local_batch_rows(vol_sh, self.batch_size, (s, s, s, 1))

    def _host_batches(self, order: np.ndarray) -> Iterator:
        bs_global = self.batch_size
        local_rows = self._local_rows()
        reader = self.cache._reader
        s = self.cache.volume_size
        f16 = getattr(self.cfg, "transfer_dtype", "float16") == "float16"
        for i in range(len(order) // bs_global):
            idxs = [int(j) for j in order[i * bs_global:(i + 1) * bs_global]]
            if local_rows is not None:
                idxs = [idxs[r] for r in local_rows]
            bs = len(idxs)
            entries = [self.cache.entries[j] for j in idxs]
            ctxs = np.asarray([e["context"] for e in entries], np.int32)
            if f16:
                # keep the batch f16 on host: the cache is f16, so the
                # device-side widen is exact and the transfer is half the
                # bytes of the f32 path; the C++ pool parallelizes the
                # raw reads when built
                d = self.cache.cache_dir
                img_paths = [os.path.join(d, e["stem"] + "_img.npy")
                             for e in entries]
                mask_paths = [os.path.join(d, e["stem"] + "_mask.npy")
                              for e in entries]
                if reader is not None:
                    imgs = np.empty((bs, s, s, s, 1), np.float16)
                    masks = np.empty((bs, s, s, s, 1), np.float16)
                    reader.read_batch_f16(img_paths, imgs)
                    reader.read_batch_f16(mask_paths, masks)
                else:
                    imgs = np.stack([np.load(p) for p in img_paths])
                    masks = np.stack([np.load(p) for p in mask_paths])
                yield imgs, masks, ctxs
            elif reader is not None:
                # native path: the C++ pool reads + widens all 2*bs files
                # in parallel without the GIL (runtime/dataio.cpp)
                imgs = np.empty((bs, s, s, s, 1), np.float32)
                masks = np.empty((bs, s, s, s, 1), np.float32)
                d = self.cache.cache_dir
                reader.read_batch(
                    [os.path.join(d, e["stem"] + "_img.npy")
                     for e in entries], imgs)
                reader.read_batch(
                    [os.path.join(d, e["stem"] + "_mask.npy")
                     for e in entries], masks)
                yield imgs, masks, ctxs
            else:
                rows = [self.cache.read(j) for j in idxs]
                yield (np.stack([r[0] for r in rows]).astype(np.float32),
                       np.stack([r[1] for r in rows]).astype(np.float32),
                       ctxs)

    def __iter__(self) -> Iterator:
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        order = np.array(self.indices)
        if self.train:
            rng.shuffle(order)

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            for batch in self._host_batches(order):
                q.put(batch)
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        aug_key = jax.random.PRNGKey(rng.integers(2 ** 31))
        step = 0
        while True:
            item = q.get()
            if item is sentinel:
                break
            vol, mask, ctx = item
            # transfer at the host dtype (f16 halves bytes), widen on device;
            # with a mesh attached the transfer lands directly on the
            # mesh-sharded layout, so each device receives only its own
            # batch (and spatial) shard
            shardings = self._shardings()
            if shardings is not None and jax.process_count() > 1:
                # multi-host: each process contributes only its local rows;
                # the global array spans all hosts' shards
                vol_sh, ctx_sh = shardings
                s = self.cache.volume_size
                gshape = (self.batch_size, s, s, s, 1)
                vol = jax.make_array_from_process_local_data(
                    vol_sh, np.ascontiguousarray(vol), gshape
                ).astype(jnp.float32)
                mask = jax.make_array_from_process_local_data(
                    vol_sh, np.ascontiguousarray(mask), gshape
                ).astype(jnp.float32)
                ctx = jax.make_array_from_process_local_data(
                    ctx_sh, np.ascontiguousarray(ctx), (self.batch_size,))
            elif shardings is not None:
                vol_sh, ctx_sh = shardings
                vol = jax.device_put(vol, vol_sh).astype(jnp.float32)
                mask = jax.device_put(mask, vol_sh).astype(jnp.float32)
                ctx = jax.device_put(ctx, ctx_sh)
            else:
                vol = jnp.asarray(vol).astype(jnp.float32)
                mask = jnp.asarray(mask).astype(jnp.float32)
                ctx = jnp.asarray(ctx)
            if self.train and self.cfg.augment:
                vol, mask = augment_batch(
                    jax.random.fold_in(aug_key, step), vol, mask, self.cfg)
            step += 1
            yield vol, mask, ctx


class DeviceSyntheticLoader:
    """Zero-transfer synthetic data source: every batch is regenerated on
    device from PRNG keys (`synthetic.synthetic_volumes_at`), bit-identical
    to the f16 cache files `write_synthetic_cache` writes for the same
    seed — only the batch's int32 indices cross the host->device boundary.

    Iteration semantics (per-epoch shuffle, split indices, device-side
    augmentation, mesh sharding) mirror `DataLoader`, so the two are
    drop-in interchangeable. Besides being the TPU-native shape for a
    synthetic input pipeline (the data source is part of the compiled
    program), this sidesteps transfer-path host-memory retention in
    relayed-device environments (measured: every uploaded buffer's RSS is
    retained; a 60-epoch 128^3 run leaks >100 GB through the file path).
    """

    def __init__(self, num_volumes: int, batch_size: int, cfg: DataConfig,
                 corpus_seed: int = 0, seed: int = 0, train: bool = True,
                 indices: Optional[Sequence[int]] = None, mesh=None,
                 spatial_axis: Optional[int] = None, gen_batch: int = 8):
        self.num_volumes = num_volumes
        self.batch_size = batch_size
        self.cfg = cfg
        self.corpus_seed = corpus_seed
        self.seed = seed
        self.train = train
        self.indices = list(indices if indices is not None
                            else range(num_volumes))
        self.mesh = mesh
        self.spatial_axis = spatial_axis
        self.gen_batch = gen_batch
        self._epoch = 0
        self._gen = None

    def __len__(self) -> int:
        return len(self.indices) // self.batch_size

    def _build_gen(self):
        import functools

        from ldm3d.data.synthetic import synthetic_volumes_at
        root = jax.random.PRNGKey(self.corpus_seed)
        fn = functools.partial(synthetic_volumes_at, root,
                               size=self.cfg.volume_size,
                               gen_batch=self.gen_batch,
                               num_classes=self.cfg.num_classes)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ldm3d.parallel.mesh import DATA_AXIS, batch_sharding
            vol_sh = batch_sharding(self.mesh, self.spatial_axis)
            ctx_sh = NamedSharding(self.mesh, P(DATA_AXIS))
            return jax.jit(fn, out_shardings=(vol_sh, vol_sh, ctx_sh))
        return jax.jit(fn)

    def __iter__(self) -> Iterator:
        if self._gen is None:
            self._gen = self._build_gen()
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        order = np.array(self.indices)
        if self.train:
            rng.shuffle(order)
        aug_key = jax.random.PRNGKey(rng.integers(2 ** 31))
        bs = self.batch_size
        for i in range(len(order) // bs):
            idxs = jnp.asarray(order[i * bs:(i + 1) * bs], jnp.int32)
            vol, mask, ctx = self._gen(idxs)
            if self.train and self.cfg.augment:
                vol, mask = augment_batch(
                    jax.random.fold_in(aug_key, i), vol, mask, self.cfg)
            yield vol, mask, ctx


class LatentLoader:
    """In-HBM latent dataset for stage-2 training (--cache_latents).

    The frozen stage-1 encode is deterministic in eval mode, so the
    reference's per-step re-encode of every 128^3 volume (dm3d.py:438) is
    redundant compute — encode the corpus ONCE (DiffusionTrainer.
    encode_latents), keep the tiny latents resident on device (a 1232-
    volume corpus at 8^3 x 256 is ~0.6 GB f32 vs ~10 GB of volumes), and
    feed `train_step_latents` straight from HBM. Yields (latents, context)
    batches under a fresh host permutation per epoch; drops the ragged
    tail batch like DataLoader (static shapes keep one compiled step)."""

    def __init__(self, latents, context, batch_size: int, seed: int = 0,
                 mesh=None, fused: bool = False):
        self.latents = latents
        self.context = context
        self.batch_size = int(batch_size)
        # fused: yield ONE (latents, context, perm) item per epoch — the
        # whole-epoch index matrix for DiffusionTrainer.train_epoch_latents
        # (one device dispatch per epoch instead of one per step)
        self.fused = bool(fused)
        self._rng = np.random.default_rng(seed)
        self.n = int(latents.shape[0])
        if self.n < self.batch_size:
            raise ValueError(
                f"{self.n} cached latents < batch size {self.batch_size}")
        self._shardings = None
        if mesh is not None and mesh.devices.size > 1:
            # batch dim over 'data' (AutoShardPolicy.DATA equivalent); the
            # latent spatial dims stay whole — at 8^3 the with_spatial
            # constraints in the train step decide any further placement
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ldm3d.parallel.mesh import DATA_AXIS
            self._shardings = (
                NamedSharding(mesh, P(DATA_AXIS)),
                NamedSharding(mesh, P(DATA_AXIS)))

    def __len__(self):
        return self.n // self.batch_size

    def __iter__(self):
        order = self._rng.permutation(self.n)
        bs = self.batch_size
        steps = self.n // bs
        if self.fused:
            perm = jnp.asarray(order[:steps * bs].reshape(steps, bs),
                               jnp.int32)
            yield self.latents, self.context, perm
            return
        for i in range(steps):
            idx = jnp.asarray(order[i * bs:(i + 1) * bs], jnp.int32)
            lat = jnp.take(self.latents, idx, axis=0)
            ctx = jnp.take(self.context, idx, axis=0)
            if self._shardings is not None:
                lat = jax.device_put(lat, self._shardings[0])
                ctx = jax.device_put(ctx, self._shardings[1])
            yield lat, ctx


def train_val_split(cache, val_fraction: float, seed: int = 0):
    """Deterministic split (reference main.py:160-183 val_perc split).
    `cache` may be a VolumeCache or a plain volume count."""
    n = cache if isinstance(cache, int) else len(cache)
    order = np.random.default_rng(seed).permutation(n)
    n_val = max(int(n * val_fraction), 1) if val_fraction > 0 else 0
    return order[n_val:].tolist(), order[:n_val].tolist()


@jax.jit
def _augment(rng, vol, mask, flip_chance, b_lo, b_hi, c_lo, c_hi):
    b = vol.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    # axis-0 flip kept with prob flip_chance (reference :116-121)
    keep = jax.random.uniform(k1, (b, 1, 1, 1, 1)) < flip_chance
    vol = jnp.where(keep, vol, jnp.flip(vol, axis=1))
    mask = jnp.where(keep, mask, jnp.flip(mask, axis=1))
    # brightness (reference :124-129)
    factor = jax.random.uniform(k2, (b, 1, 1, 1, 1), minval=b_lo, maxval=b_hi)
    vol = jnp.clip(vol * factor, 0.0, 1.0)
    # contrast (reference :132-138)
    cf = jax.random.uniform(k3, (b, 1, 1, 1, 1), minval=c_lo, maxval=c_hi)
    mean = jnp.mean(vol, axis=(1, 2, 3, 4), keepdims=True)
    vol = jnp.clip((1.0 + cf) * (vol - mean) + mean, 0.0, 1.0)
    return vol, mask


def augment_batch(rng, vol, mask, cfg: DataConfig):
    return _augment(rng, vol, mask, cfg.flip_chance,
                    cfg.brightness_range[0], cfg.brightness_range[1],
                    cfg.contrast_range[0], cfg.contrast_range[1])
