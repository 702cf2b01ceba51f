"""Golden-header cross-validation of the from-scratch NIfTI-1 reader
(VERDICT r1 #6): headers are built byte-by-byte in this file, directly
from the NIfTI-1 specification (nifti1.h), independently of both
`load_nifti` and `save_nifti`, covering the real-world conventions a
header bug would silently corrupt: qform-only files (quaternion + qfac),
scl_slope/inter rescaling (incl. the slope==0 "no scaling" rule), int16
and uint8 payloads, F-order voxel layout, sform priority, and big-endian
files. Expected affines are literal matrices computed by hand from the
spec's quaternion formula.

Reference behavior being guarded: dataset_utils.py:85-113,141-188 feeds
every training volume through dipy's loader; a qform sign or F-order
mistake here would corrupt all real training data while passing every
synthetic-roundtrip test.
"""

import gzip
import struct

import numpy as np
import pytest

from ldm3d.data.nifti import load_nifti


def _build_nifti(shape, data, *, endian="<", datatype=16, pixdim=None,
                 scl_slope=1.0, scl_inter=0.0, qform_code=0, sform_code=0,
                 quatern=(0.0,) * 6, srow=None, qfac=1.0):
    """Write a NIfTI-1 byte blob straight from the spec's field table."""
    hdr = bytearray(352)
    p = lambda fmt, off, *v: struct.pack_into(endian + fmt, hdr, off, *v)
    p("i", 0, 348)                                      # sizeof_hdr
    dims = (len(shape),) + tuple(shape) + (1,) * (7 - len(shape))
    p("8h", 40, *dims)                                  # dim
    p("h", 70, datatype)                                # datatype
    bitpix = {2: 8, 4: 16, 8: 32, 16: 32, 64: 64}[datatype]
    p("h", 72, bitpix)                                  # bitpix
    pd = pixdim or (1.0, 1.0, 1.0)
    p("8f", 76, qfac, *pd, 0.0, 0.0, 0.0, 0.0)          # pixdim (pixdim[0]=qfac)
    p("f", 108, 352.0)                                  # vox_offset
    p("f", 112, scl_slope)
    p("f", 116, scl_inter)
    p("2h", 252, qform_code, sform_code)
    p("6f", 256, *quatern)    # quatern_b,c,d, qoffset_x,y,z
    if srow is not None:
        p("12f", 280, *np.asarray(srow, np.float64).reshape(12))
    hdr[344:348] = b"n+1\x00"
    np_dtype = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
                64: np.float64}[datatype]
    payload = np.asarray(data, np_dtype).astype(
        np.dtype(np_dtype).newbyteorder(endian))
    # NIfTI voxel data is x-fastest (Fortran order)
    return bytes(hdr) + payload.tobytes(order="F")


def _write(tmp_path, blob, name="t.nii.gz"):
    path = str(tmp_path / name)
    with gzip.open(path, "wb") as f:
        f.write(blob)
    return path


def test_f_order_voxel_layout(tmp_path):
    # distinct value at every voxel; reader must map [x, y, z] correctly
    data = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = _write(tmp_path, _build_nifti((2, 3, 4), data))
    vol, _ = load_nifti(path)
    np.testing.assert_array_equal(vol, data)


def test_int16_with_scl_slope_inter(tmp_path):
    data = np.array([[[-5, 0], [7, 100]], [[1, -1], [32000, -32000]]],
                    np.int16)
    path = _write(tmp_path, _build_nifti((2, 2, 2), data,
                                         datatype=4, scl_slope=2.5,
                                         scl_inter=-3.0))
    vol, _ = load_nifti(path)
    np.testing.assert_allclose(vol, data.astype(np.float32) * 2.5 - 3.0,
                               rtol=1e-6)


def test_scl_slope_zero_means_no_scaling(tmp_path):
    # nifti1.h: "If scl_slope field is zero, scaling is not to be applied"
    # — including scl_inter (a naive reader adds inter anyway)
    data = np.full((2, 2, 2), 10.0, np.float32)
    path = _write(tmp_path, _build_nifti((2, 2, 2), data,
                                         scl_slope=0.0, scl_inter=99.0))
    vol, _ = load_nifti(path)
    np.testing.assert_array_equal(vol, data)


def test_uint8_mask_payload(tmp_path):
    data = (np.arange(8).reshape(2, 2, 2) % 2).astype(np.uint8)
    path = _write(tmp_path, _build_nifti((2, 2, 2), data, datatype=2))
    vol, _ = load_nifti(path)
    np.testing.assert_array_equal(vol, data.astype(np.float32))


def test_qform_only_identity_quaternion(tmp_path):
    # b=c=d=0 -> a=1 -> R=I, scaled by pixdim; offsets from qoffset_*
    data = np.zeros((2, 2, 2), np.float32)
    path = _write(tmp_path, _build_nifti(
        (2, 2, 2), data, pixdim=(2.0, 3.0, 4.0), qform_code=1,
        quatern=(0.0, 0.0, 0.0, 10.0, -20.0, 30.0)))
    _, affine = load_nifti(path)
    expected = np.array([
        [2.0, 0.0, 0.0, 10.0],
        [0.0, 3.0, 0.0, -20.0],
        [0.0, 0.0, 4.0, 30.0],
        [0.0, 0.0, 0.0, 1.0]])
    np.testing.assert_allclose(affine, expected, atol=1e-6)


def test_qform_rotation_and_negative_qfac(tmp_path):
    # b=c=0, d=sqrt(0.5) -> a=sqrt(0.5): 90-degree rotation about z:
    #   R = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    # columns scaled by (pixdim1, pixdim2, qfac * pixdim3), qfac = -1
    # (hand-evaluated from the nifti1.h quaternion formula)
    d = np.sqrt(0.5)
    data = np.zeros((2, 2, 2), np.float32)
    path = _write(tmp_path, _build_nifti(
        (2, 2, 2), data, pixdim=(1.0, 1.0, 2.0), qform_code=1, qfac=-1.0,
        quatern=(0.0, 0.0, d, 1.0, 2.0, 3.0)))
    _, affine = load_nifti(path)
    expected = np.array([
        [0.0, -1.0, 0.0, 1.0],
        [1.0, 0.0, 0.0, 2.0],
        [0.0, 0.0, -2.0, 3.0],
        [0.0, 0.0, 0.0, 1.0]])
    np.testing.assert_allclose(affine, expected, atol=1e-6)


def test_sform_takes_priority_over_qform(tmp_path):
    data = np.zeros((2, 2, 2), np.float32)
    srow = np.array([[1.0, 0.0, 0.0, 5.0],
                     [0.0, 1.0, 0.0, 6.0],
                     [0.0, 0.0, 1.0, 7.0]])
    path = _write(tmp_path, _build_nifti(
        (2, 2, 2), data, qform_code=1, sform_code=1,
        quatern=(0.0, 0.0, 0.0, -1.0, -2.0, -3.0), srow=srow))
    _, affine = load_nifti(path)
    np.testing.assert_allclose(affine[:3, :], srow, atol=1e-6)


def test_pixdim_fallback_affine(tmp_path):
    data = np.zeros((2, 2, 2), np.float32)
    path = _write(tmp_path, _build_nifti((2, 2, 2), data,
                                         pixdim=(0.7, 0.8, 0.9)))
    _, affine = load_nifti(path)
    np.testing.assert_allclose(np.diag(affine),
                               [0.7, 0.8, 0.9, 1.0], atol=1e-6)


def test_big_endian_file(tmp_path):
    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    path = _write(tmp_path, _build_nifti((2, 2, 2), data, endian=">",
                                         datatype=16, scl_slope=2.0))
    vol, _ = load_nifti(path)
    np.testing.assert_allclose(vol, data * 2.0, rtol=1e-6)


def test_voxsize_is_abs_pixdim(tmp_path):
    data = np.zeros((2, 2, 2), np.float32)
    path = _write(tmp_path, _build_nifti((2, 2, 2), data,
                                         pixdim=(1.5, 2.5, 3.5)))
    _, _, voxsize = load_nifti(path, return_voxsize=True)
    assert voxsize == (1.5, 2.5, 3.5)


def test_garbage_file_rejected(tmp_path):
    path = _write(tmp_path, b"\x00" * 400)
    with pytest.raises(ValueError):
        load_nifti(path)
