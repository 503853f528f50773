"""ctypes bindings for the native trajio library (native/trajio/trajio.cpp).

Auto-builds on first import if g++ is available; falls back with ImportError
so pure-Python codecs keep working.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libtrajio.so")
_SRC_PATH = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native", "trajio", "trajio.cpp")
)


def _stale() -> bool:
    """Rebuild when the .so is missing or older than trajio.cpp, so source
    edits take effect and a foreign-arch binary never gets loaded silently."""
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        return os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


if _stale():
    try:
        from jamun_tpu.data.build_native import build

        build(verbose=False)
    except Exception as e:  # pragma: no cover
        raise ImportError(f"native trajio not built and auto-build failed: {e}") from e

_lib = ctypes.CDLL(_LIB_PATH)

_lib.trajio_dcd_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
_lib.trajio_dcd_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
_lib.trajio_dcd_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
_lib.trajio_xtc_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
_lib.trajio_xtc_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
_lib.trajio_xtc_write.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_float,
]

__all__ = ["read_dcd", "write_dcd", "read_xtc", "write_xtc"]


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_dcd(path: str) -> np.ndarray:
    nf, na = ctypes.c_int(), ctypes.c_int()
    rc = _lib.trajio_dcd_info(path.encode(), ctypes.byref(nf), ctypes.byref(na))
    if rc != 0:
        raise IOError(f"trajio_dcd_info({path}) failed: {rc}")
    out = np.empty((nf.value, na.value, 3), np.float32)
    got = _lib.trajio_dcd_read(path.encode(), _fptr(out), nf.value)
    if got < 0:
        raise IOError(f"trajio_dcd_read({path}) failed: {got}")
    return out[:got]


def write_dcd(path: str, pos_nm: np.ndarray) -> None:
    pos = np.ascontiguousarray(pos_nm, np.float32)
    rc = _lib.trajio_dcd_write(path.encode(), _fptr(pos), pos.shape[0], pos.shape[1])
    if rc != 0:
        raise IOError(f"trajio_dcd_write({path}) failed: {rc}")


def read_xtc(path: str) -> np.ndarray:
    nf, na = ctypes.c_int(), ctypes.c_int()
    rc = _lib.trajio_xtc_info(path.encode(), ctypes.byref(nf), ctypes.byref(na))
    if rc != 0 or nf.value <= 0:
        raise IOError(f"trajio_xtc_info({path}) failed: rc={rc} frames={nf.value}")
    out = np.empty((nf.value, na.value, 3), np.float32)
    got = _lib.trajio_xtc_read(path.encode(), _fptr(out), nf.value)
    if got <= 0:
        raise IOError(f"trajio_xtc_read({path}) failed: {got}")
    return out[:got]


def write_xtc(path: str, pos_nm: np.ndarray, precision: float = 1000.0) -> None:
    pos = np.ascontiguousarray(pos_nm, np.float32)
    rc = _lib.trajio_xtc_write(path.encode(), _fptr(pos), pos.shape[0], pos.shape[1], precision)
    if rc != 0:
        raise IOError(f"trajio_xtc_write({path}) failed: {rc}")
