"""Data layer tests: cache round-trip, native C++ reader vs numpy,
loader batching/augmentation, NIfTI reader."""

import gzip
import os
import struct
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.core.config import DataConfig
from ldm3d.data.pipeline import (DataLoader, VolumeCache, augment_batch,
                                 train_val_split, write_synthetic_cache)


@pytest.fixture(scope="module")
def cache_dir():
    d = tempfile.mkdtemp()
    write_synthetic_cache(d, num_volumes=6, size=8)
    return d


def test_cache_roundtrip(cache_dir):
    cache = VolumeCache(cache_dir)
    assert len(cache) == 6
    img, mask, ctx = cache.read(0)
    assert img.shape == (8, 8, 8, 1)
    assert mask.shape == (8, 8, 8, 1)
    assert ctx in (0, 1)
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0


def test_native_reader_matches_numpy(cache_dir):
    from ldm3d.data.native import NativeReader, npy_f16_layout
    reader = NativeReader.maybe_create()
    if reader is None:
        pytest.skip("native runtime not built (no g++)")
    path = os.path.join(cache_dir, "vol_00000_img.npy")
    native = reader.read_npy(path)
    ref = np.load(path).astype(np.float32)
    np.testing.assert_array_equal(native, ref)
    # batch path
    paths = [os.path.join(cache_dir, f"vol_{i:05d}_img.npy")
             for i in range(4)]
    out = np.empty((4, 8, 8, 8, 1), np.float32)
    reader.read_batch(paths, out)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(out[i], np.load(p).astype(np.float32))


def test_native_layout_parser(cache_dir):
    from ldm3d.data.native import npy_f16_layout
    path = os.path.join(cache_dir, "vol_00000_img.npy")
    offset, shape = npy_f16_layout(path)
    assert shape == (8, 8, 8, 1)
    with open(path, "rb") as f:
        raw = f.read()
    data = np.frombuffer(raw[offset:], np.float16).reshape(shape)
    np.testing.assert_array_equal(data, np.load(path))


def test_loader_batches_and_split(cache_dir):
    cache = VolumeCache(cache_dir)
    tr, va = train_val_split(cache, val_fraction=0.34, seed=0)
    assert len(tr) + len(va) == 6
    assert set(tr).isdisjoint(va)
    loader = DataLoader(cache, batch_size=2, cfg=DataConfig(), train=True,
                        indices=tr)
    batches = list(loader)
    assert len(batches) == len(tr) // 2
    vol, mask, ctx = batches[0]
    assert vol.shape == (2, 8, 8, 8, 1)
    assert ctx.shape == (2,)
    # epoch 2 shuffles differently but yields the same count
    batches2 = list(loader)
    assert len(batches2) == len(batches)


def test_augmentation_keeps_range_and_flips():
    vol = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 8, 8, 1))
    mask = (vol > 0.5).astype(jnp.float32)
    cfg = DataConfig(flip_chance=0.0)  # always flip
    v2, m2 = augment_batch(jax.random.PRNGKey(1), vol, mask, cfg)
    assert float(v2.min()) >= 0.0 and float(v2.max()) <= 1.0
    # flip applied jointly to vol and mask: where mask was flipped, vol was
    flipped_mask = jnp.flip(mask, axis=1)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(flipped_mask))


def test_nifti_reader_roundtrip(tmp_path):
    """Write a minimal NIfTI-1 file by hand and read it back."""
    from ldm3d.data.nifti import load_nifti
    shape = (4, 5, 6)
    data = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, *shape, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 16)            # float32
    struct.pack_into("<8f", hdr, 76, 1, 2, 2, 2, 1, 1, 1, 1)  # pixdim 2mm
    struct.pack_into("<f", hdr, 108, 352)          # vox_offset
    struct.pack_into("<2h", hdr, 252, 0, 0)        # no q/sform
    payload = bytes(hdr) + b"\x00\x00\x00\x00" + data.tobytes(order="F")
    path = os.path.join(tmp_path, "vol.nii.gz")
    with gzip.open(path, "wb") as f:
        f.write(payload)
    vol, affine, voxsize = load_nifti(path, return_voxsize=True)
    np.testing.assert_array_equal(vol, data)
    assert voxsize == (2.0, 2.0, 2.0)
    np.testing.assert_allclose(affine[:3, :3], np.diag([2, 2, 2]))


def test_native_raw_f16_batch(cache_dir):
    """Parallel raw-f16 batch reads match np.load (the f16-transfer path)."""
    from ldm3d.data.native import NativeReader
    from ldm3d.data.pipeline import VolumeCache

    reader = NativeReader.maybe_create()
    if reader is None:
        pytest.skip("native runtime not built (no g++)")
    cache = VolumeCache(cache_dir)
    import os
    paths = [os.path.join(cache.cache_dir, e["stem"] + "_img.npy")
             for e in cache.entries[:3]]
    s = cache.volume_size
    out = np.empty((3, s, s, s, 1), np.float16)
    reader.read_batch_f16(paths, out)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(out[i], np.load(p))


def test_save_nifti_roundtrip(tmp_path):
    """NIfTI-1 writer round-trips through the reader (export path for
    generated volumes; the reference only writes .npy, dm3d.py:542-544)."""
    from ldm3d.data.nifti import load_nifti, save_nifti

    vol = np.random.default_rng(3).uniform(size=(8, 10, 12)).astype(
        np.float32)
    for name in ("v.nii", "v.nii.gz"):
        p = str(tmp_path / name)
        save_nifti(p, vol, voxsize=(1.0, 1.0, 2.0))
        back, affine = load_nifti(p)
        np.testing.assert_allclose(back, vol, rtol=1e-6)
        np.testing.assert_allclose(np.diag(affine)[:3], [1.0, 1.0, 2.0])
