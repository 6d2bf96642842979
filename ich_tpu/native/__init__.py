"""Native host-side data path (C++ via ctypes).

Builds ``libfastload.so`` from :file:`fastload.cpp` on demand (g++, cached
next to the source) and exposes:

- :func:`load_nifti_f32` — zlib-aware NIfTI-1 volume decode straight into a
  float32 numpy buffer (scl slope/intercept applied),
- :func:`window_resize_batch` — multithreaded HU windowing + bilinear
  resize of a slice stack (the host half of the preprocessing chain, before
  arrays are parked in HBM).

Everything degrades gracefully: :func:`available` is False when no compiler
or the build fails, and callers fall back to the pure-Python
implementations (:mod:`ich_tpu.data.nifti`, PIL/scipy).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import weakref
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastload.cpp")
_LIB = os.path.join(_HERE, "libfastload.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no compiler / failed build → fallback
        logger.warning("native fastload build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        logger.warning("native fastload load failed: %s", e)
        _build_failed = True
        return None
    lib.nifti_probe.restype = ctypes.c_int
    lib.nifti_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_float)]
    lib.nifti_read_f32.restype = ctypes.c_int64
    lib.nifti_read_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64]
    lib.nifti_read_alloc.restype = ctypes.c_int64
    lib.nifti_read_alloc.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.fastload_free.restype = None
    lib.fastload_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.nifti_read_many.restype = None
    lib.nifti_read_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    lib.window_resize_batch.restype = None
    lib.window_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_nifti_f32(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """(volume float32 Fortran-order reshaped, pixdim[ndim]) via the native
    decoder. Raises RuntimeError when the library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    dims = np.zeros(8, np.int32)
    pixdim = np.zeros(8, np.float32)
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = lib.nifti_read_alloc(
        path.encode(), ctypes.byref(ptr),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pixdim.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n < 0:
        raise IOError(f"nifti_read_alloc failed on {path} (code {n})")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(int(n),)).copy()
    finally:
        lib.fastload_free(ptr)
    ndim = int(dims[0])
    shape = tuple(int(d) for d in dims[1 : 1 + ndim])
    return out.reshape(shape, order="F"), pixdim[1 : 1 + ndim]


def load_nifti_batch(
    paths, n_threads: Optional[int] = None
) -> "list[Tuple[np.ndarray, np.ndarray]]":
    """Decode many NIfTI files concurrently (file-level C++ thread pool —
    each gzip stream is serial, so parallelism comes from the batch).
    Returns [(volume, pixdim), ...] in input order; raises on any failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    n = len(paths)
    if n == 0:
        return []
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)()
    dims = np.zeros((n, 8), np.int32)
    pixdim = np.zeros((n, 8), np.float32)
    status = np.zeros(n, np.int64)
    lib.nifti_read_many(
        c_paths, n, ptrs,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pixdim.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
    )
    bad = [(paths[i], int(status[i])) for i in range(n) if status[i] < 0]
    if bad:
        for i in range(n):
            if ptrs[i]:
                lib.fastload_free(ptrs[i])
        raise IOError(f"nifti_read_many failed: {bad}")
    out = []
    for i in range(n):
        cnt = int(status[i])
        # zero-copy: wrap the C buffer and free it when the array dies.
        # Finalize the ndarray, NOT arr.base: the base is a memoryview,
        # which is only weakref-able since Python 3.12. The reshape below
        # keeps `arr` alive through its .base chain, so the finalizer runs
        # exactly when the last view dies.
        arr = np.ctypeslib.as_array(ptrs[i], shape=(cnt,))
        weakref.finalize(arr, lib.fastload_free, ptrs[i])
        ndim = int(dims[i, 0])
        shape = tuple(int(d) for d in dims[i, 1 : 1 + ndim])
        out.append((arr.reshape(shape, order="F"), pixdim[i, 1 : 1 + ndim]))
    return out


def window_resize_batch(
    slices: np.ndarray,
    center: float,
    width: float,
    out_size: Tuple[int, int],
    n_threads: Optional[int] = None,
) -> np.ndarray:
    """(N, H, W) float32 → windowed [0,1] + bilinear-resized (N, oh, ow)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    slices = np.ascontiguousarray(slices, dtype=np.float32)
    n, h, w = slices.shape
    oh, ow = out_size
    out = np.empty((n, oh, ow), np.float32)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib.window_resize_batch(
        slices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h, w,
        ctypes.c_float(center), ctypes.c_float(width),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow, n_threads,
    )
    return out
