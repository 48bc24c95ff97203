"""ctypes bindings for the native batch-assembly core (npy_loader.cpp),
with transparent build-on-first-use and a pure-numpy fallback.

The native path reads every feature .npy of a batch in a C++ thread pool and
streams payloads directly into the final zero-padded (B, T_pad, S·D) buffer —
no GIL, no intermediate arrays.  Python fallback keeps identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "npy_loader.cpp")
_SO = os.path.join(_HERE, "libnpyloader.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO,
                 "-lpthread"],
                stderr=subprocess.DEVNULL)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _build_failed = True
        return None
    lib.npy_header_probe.restype = ctypes.c_int
    lib.npy_header_probe.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.assemble_f32_batch.restype = ctypes.c_int
    lib.assemble_f32_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def probe_npy_shape(path: str) -> Tuple[int, ...]:
    lib = _get_lib()
    if lib is not None:
        shape = (ctypes.c_int64 * 8)()
        ndim = lib.npy_header_probe(path.encode(), shape)
        if ndim > 0:
            return tuple(int(shape[i]) for i in range(ndim))
    return tuple(np.load(path, mmap_mode="r", allow_pickle=True).shape)


def assemble_feature_batch(paths: Sequence[str], t_pad: int,
                           tail_shape: Tuple[int, ...],
                           n_threads: int = 8) -> np.ndarray:
    """Read float32 .npy files of shape (T_i, *tail_shape) into a zero-padded
    (len(paths), t_pad, *tail_shape) batch.  Files longer than t_pad are
    truncated (matching data/batching.pad_features semantics)."""
    row_elems = int(np.prod(tail_shape))
    out = np.empty((len(paths), t_pad) + tuple(tail_shape), np.float32)
    lib = _get_lib()
    if lib is not None:
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        rc = lib.assemble_f32_batch(
            arr, len(paths), t_pad, row_elems,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        if rc == 0:
            return out
        # fall through to python on any parse failure (e.g. non-f32 files)
    for i, p in enumerate(paths):
        f = np.load(p, allow_pickle=True)
        f = f.reshape((f.shape[0], -1)).astype(np.float32, copy=False)
        rows = min(f.shape[0], t_pad)
        flat = out[i].reshape(t_pad, row_elems)
        flat[:rows] = f[:rows, :row_elems]
        flat[rows:] = 0.0
    return out
