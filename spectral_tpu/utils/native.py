"""ctypes bindings to the native C++ IO runtime (csrc/io.cpp).

Compiled on first use with g++ (cached next to the package); every caller
has a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src_dir = _csrc_dir()
        src = os.path.join(src_dir, "io.cpp")
        so = os.path.join(src_dir, "libspectral_io.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.st_format_rows.restype = ctypes.c_int64
            lib.st_format_rows.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64]
            lib.st_format_tensors.restype = ctypes.c_int64
            lib.st_format_tensors.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64]
            lib.st_write_blob.restype = ctypes.c_int64
            lib.st_write_blob.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_double),
                                          ctypes.c_int64]
            lib.st_read_blob.restype = ctypes.c_int64
            lib.st_read_blob.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_double),
                                         ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def format_rows(arr: np.ndarray) -> str:
    """Rows of '%20e ' values, one line per row (native; raises if absent)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    a = np.ascontiguousarray(arr, dtype=np.float64)
    rows, cols = a.shape
    cap = rows * (cols * 24 + 2) + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.st_format_rows(a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           rows, cols, buf, cap)
    if n < 0:
        raise RuntimeError("native formatting failed")
    return buf.raw[:n].decode().rstrip("\n")


def format_tensors(arr: np.ndarray) -> str:
    """(nodes, 3, 3) tensor blocks in VTK TENSORS layout."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    a = np.ascontiguousarray(arr, dtype=np.float64)
    nodes = a.shape[0]
    cap = nodes * (3 * (3 * 24 + 2) + 2) + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.st_format_tensors(a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                              nodes, buf, cap)
    if n < 0:
        raise RuntimeError("native formatting failed")
    return buf.raw[:n].decode()


# Blob wire format (shared by csrc/io.cpp st_write_blob/st_read_blob and the
# Python fallback below): <u64 magic 'SPECTLTR'> <u64 count> <count f64 LE>.
_BLOB_MAGIC = 0x53504543544C5452


def write_blob(path: str, arr: np.ndarray) -> None:
    lib = _load()
    a = np.ascontiguousarray(arr, dtype=np.float64).reshape(-1)
    if lib is None:
        import struct
        with open(path, "wb") as f:
            f.write(struct.pack("<QQ", _BLOB_MAGIC, a.size))
            a.astype("<f8", copy=False).tofile(f)
        return
    rc = lib.st_write_blob(path.encode(),
                           a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           a.size)
    if rc != 0:
        raise IOError(f"st_write_blob failed rc={rc}")


def read_blob(path: str, n: int) -> np.ndarray:
    lib = _load()
    out = np.empty(n, dtype=np.float64)
    if lib is None:
        import struct
        with open(path, "rb") as f:
            magic, count = struct.unpack("<QQ", f.read(16))
            if magic != _BLOB_MAGIC:
                raise IOError(f"bad blob magic in {path}: {magic:#x}")
            if count != n:
                raise IOError(f"blob {path} holds {count} values, need {n}")
            return np.fromfile(f, dtype="<f8", count=n)
    rc = lib.st_read_blob(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    if rc != 0:
        raise IOError(f"st_read_blob failed rc={rc}")
    return out
