"""ctypes binding to the native C++ data-loader runtime
(runtime/dataio.cpp). Builds lazily with `make -C runtime` on first use if
g++ is available; everything degrades to numpy when it is not."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libldm3d_dataio.so")

_build_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _RUNTIME_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ldm3d_pool_create.restype = ctypes.c_void_p
            lib.ldm3d_pool_create.argtypes = [ctypes.c_int]
            lib.ldm3d_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.ldm3d_pool_submit_f16.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.ldm3d_pool_wait.restype = ctypes.c_int64
            lib.ldm3d_pool_wait.argtypes = [ctypes.c_void_p]
            lib.ldm3d_read_f16_as_f32.restype = ctypes.c_int
            lib.ldm3d_read_f16_as_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            if hasattr(lib, "ldm3d_pool_submit_raw"):
                lib.ldm3d_pool_submit_raw.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def npy_f16_layout(path: str) -> Tuple[int, Tuple[int, ...]]:
    """(data_offset, shape) of a little-endian float16 C-order .npy file.
    Raises ValueError for anything else (the cache always writes f16)."""
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"{path}: not a .npy file")
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            hlen = int.from_bytes(f.read(2), "little")
        else:
            hlen = int.from_bytes(f.read(4), "little")
        header = f.read(hlen).decode("latin1")
        offset = f.tell()
    d: Dict = eval(header, {"__builtins__": {}},
                   {"False": False, "True": True})  # trusted cache files
    if d.get("descr") not in ("<f2", "|f2"):
        raise ValueError(f"{path}: dtype {d.get('descr')} is not float16")
    if d.get("fortran_order"):
        raise ValueError(f"{path}: fortran order unsupported")
    return offset, tuple(d["shape"])


class NativeReader:
    """Thread-pool reader delivering ready float32 volume batches.

    Usage:
        reader = NativeReader.maybe_create()
        reader.read_npy(path)                      # single volume
        reader.read_batch(paths, out_array)        # parallel batch fill
    """

    def __init__(self, lib: ctypes.CDLL, n_threads: int = 4):
        self._lib = lib
        self._pool = lib.ldm3d_pool_create(n_threads)
        self._layout_cache: Dict[str, Tuple[int, Tuple[int, ...]]] = {}

    @classmethod
    def maybe_create(cls, n_threads: int = 4) -> Optional["NativeReader"]:
        lib = _load_library()
        return cls(lib, n_threads) if lib is not None else None

    def __del__(self):
        try:
            if getattr(self, "_pool", None):
                self._lib.ldm3d_pool_destroy(self._pool)
        except Exception:
            pass

    def _layout(self, path: str):
        out = self._layout_cache.get(path)
        if out is None:
            out = npy_f16_layout(path)
            self._layout_cache[path] = out
        return out

    def read_npy(self, path: str) -> np.ndarray:
        offset, shape = self._layout(path)
        out = np.empty(shape, np.float32)
        rc = self._lib.ldm3d_read_f16_as_f32(
            path.encode(), offset,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size)
        if rc != 0:
            raise IOError(f"native read failed ({rc}): {path}")
        return out

    def read_batch_f16(self, paths: Sequence[str], out: np.ndarray) -> None:
        """Fill out[i] from paths[i] in parallel at cache precision
        (out: [N, ...] float16; raw reads, no widening)."""
        if not hasattr(self._lib, "ldm3d_pool_submit_raw"):
            for i, path in enumerate(paths):  # stale .so: plain reads
                out[i] = np.load(path).reshape(out.shape[1:])
            return
        assert out.dtype == np.float16 and out.flags.c_contiguous
        per = int(np.prod(out.shape[1:]))
        base = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        for i, path in enumerate(paths):
            offset, shape = self._layout(path)
            if int(np.prod(shape)) != per:
                raise ValueError(f"{path}: shape {shape} != batch slot")
            dst = ctypes.cast(
                ctypes.addressof(base.contents) + i * per * 2,
                ctypes.POINTER(ctypes.c_uint8))
            self._lib.ldm3d_pool_submit_raw(
                self._pool, path.encode(), offset, dst, per * 2)
        errors = self._lib.ldm3d_pool_wait(self._pool)
        if errors:
            raise IOError(f"{errors} native raw reads failed")

    def read_batch(self, paths: Sequence[str], out: np.ndarray) -> None:
        """Fill out[i] from paths[i] in parallel (out: [N, ...] float32)."""
        assert out.dtype == np.float32 and out.flags.c_contiguous
        per = int(np.prod(out.shape[1:]))
        base = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        for i, path in enumerate(paths):
            offset, shape = self._layout(path)
            if int(np.prod(shape)) != per:
                raise ValueError(f"{path}: shape {shape} != batch slot")
            dst = ctypes.cast(
                ctypes.addressof(base.contents) + i * per * 4,
                ctypes.POINTER(ctypes.c_float))
            self._lib.ldm3d_pool_submit_f16(
                self._pool, path.encode(), offset, dst, per)
        errors = self._lib.ldm3d_pool_wait(self._pool)
        if errors:
            raise IOError(f"{errors} native batch reads failed")
