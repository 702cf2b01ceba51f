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


def _write_vol(path, vol, voxsize=(1.0, 1.0, 1.0)):
    from ldm3d.data.nifti import save_nifti
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_nifti(path, vol, voxsize=voxsize)


def test_load_transform_img_dataset_rules(tmp_path):
    """Per-dataset mask + context rules (reference dataset_utils.py:141-188):
    CC359 multiplies by the STAPLE mask then returns a ZERO mask channel
    (as the reference does), BraTS binarizes the seg mask and sets
    context=1, HCP gets a zero mask; volumes are min-max'd to [0,1]."""
    import os
    from ldm3d.data.nifti import load_transform_img

    rng = np.random.default_rng(0)
    vol = rng.uniform(0.0, 100.0, size=(32, 32, 32)).astype(np.float32)

    # CC359: brain mask zeroes half the volume
    cc = str(tmp_path / "CC359" / "Original" / "subj1.nii.gz")
    staple = str(tmp_path / "CC359" / "STAPLE" / "subj1_staple.nii.gz")
    m = np.zeros_like(vol); m[8:24, 8:24, 8:24] = 1.0
    _write_vol(cc, vol); _write_vol(staple, m)
    v, mask, ctx = load_transform_img(cc)
    assert v.shape == (128, 128, 128, 1) and ctx == 0
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert mask.max() == 0.0       # reference zeroes the non-BraTS mask

    # BraTS: tumor seg -> binary mask channel, context 1
    t1 = str(tmp_path / "BraTS2021" / "case" / "case_t1.nii.gz")
    seg = str(tmp_path / "BraTS2021" / "case" / "case_seg.nii.gz")
    sm = np.zeros_like(vol); sm[10:16, 10:16, 10:16] = 4.0  # label > 1
    _write_vol(t1, vol, voxsize=(2, 2, 2)); _write_vol(seg, sm,
                                                       voxsize=(2, 2, 2))
    v, mask, ctx = load_transform_img(t1)
    assert v.shape == (128, 128, 128, 1) and ctx == 1
    assert set(np.unique(mask)) <= {0.0, 1.0}   # binarized
    assert mask.sum() > 0

    # HCP (any other path): zero mask, context 0
    hcp = str(tmp_path / "HCP_T1" / "T1" / "x.nii.gz")
    _write_vol(hcp, vol)
    v, mask, ctx = load_transform_img(hcp)
    assert ctx == 0 and mask.max() == 0.0 and np.isfinite(v).all()


def test_get_dataset_list_layout(tmp_path):
    """Dataset discovery globs the reference's directory layout
    (dataset_utils.py:27-82) with deterministic ordering and --test_run
    truncation."""
    from ldm3d.data.nifti import get_dataset_list

    d = str(tmp_path)
    vol = np.zeros((4, 4, 4), np.float32)
    _write_vol(os.path.join(d, "CC359", "Original", "b.nii.gz"), vol)
    _write_vol(os.path.join(d, "CC359", "Original", "a.nii.gz"), vol)
    _write_vol(os.path.join(d, "HCP_T1", "T1", "h.nii.gz"), vol)
    _write_vol(os.path.join(d, "BraTS2021", "c1", "c1_t1.nii.gz"), vol)
    _write_vol(os.path.join(
        d, "NFBS_Dataset", "s1", "sub-1_ses-NFB3_T1w_brain.nii.gz"), vol)

    cc = get_dataset_list("CC", dataset_dir=d)
    assert [os.path.basename(p) for p in cc] == ["a.nii.gz", "b.nii.gz"]
    assert len(get_dataset_list("all", dataset_dir=d)) == 4
    assert len(get_dataset_list("all-T", dataset_dir=d)) == 5
    assert len(get_dataset_list("all-T", True, dataset_dir=d)) == 5  # <24


def test_device_synthetic_loader_matches_cache(tmp_path):
    """The on-device regenerator must produce bit-identical volumes to the
    f16 cache files written by write_synthetic_cache for the same seed —
    cached-file and zero-transfer runs train on the same data."""
    import jax
    import jax.numpy as jnp
    from ldm3d.core.config import DataConfig
    from ldm3d.data.pipeline import (DataLoader, DeviceSyntheticLoader,
                                     VolumeCache, write_synthetic_cache)

    write_synthetic_cache(str(tmp_path), 10, 16, seed=5)
    cache = VolumeCache(str(tmp_path))
    cfg = DataConfig(volume_size=16)
    idx = [3, 8, 1, 9]  # crosses gen_batch group boundaries
    file_loader = DataLoader(cache, 4, cfg, seed=2, train=False,
                             indices=idx)
    dev_loader = DeviceSyntheticLoader(10, 4, cfg, corpus_seed=5, seed=2,
                                       train=False, indices=idx)
    (fv, fm, fc), = list(file_loader)
    (dv, dm, dc), = list(dev_loader)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(dm))
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(dc))


def test_device_synthetic_loader_epoch_shuffle_and_len(tmp_path):
    from ldm3d.core.config import DataConfig
    from ldm3d.data.pipeline import DeviceSyntheticLoader

    loader = DeviceSyntheticLoader(12, 4, DataConfig(volume_size=16),
                                   corpus_seed=0, seed=0, train=True)
    assert len(loader) == 3
    e1 = [np.asarray(b[2]) for b in loader]
    e2 = [np.asarray(b[2]) for b in loader]
    assert len(e1) == 3 and len(e2) == 3  # reshuffles but full epochs
