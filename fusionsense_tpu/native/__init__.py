"""Native (C++) components, loaded via ctypes.

Builds lazily with g++ on first import if the shared library is missing
(the toolchain ships no pybind11; the C ABI + ctypes keeps the binding
dependency-free). Source lives in <repo>/native/.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libcutpursuit.so"


def _build():
    src = _NATIVE_DIR / "cutpursuit.cpp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
         "-o", str(_LIB_PATH), str(src)],
        check=True, capture_output=True)


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        # stale binary for a different arch/libc — rebuild from source
        _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.fh_segment.restype = ctypes.c_int
    lib.fh_segment.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int64, f32p, u32p, u32p,
        ctypes.c_void_p, ctypes.c_float, ctypes.c_int, i32p]
    lib.cutpursuit.restype = ctypes.c_int
    lib.cutpursuit.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int64, f32p, u32p, u32p,
        ctypes.c_void_p, ctypes.c_float, ctypes.c_int, i32p]
    _lib = lib
    return lib


def fh_segment(feats: np.ndarray, src: np.ndarray, dst: np.ndarray,
               edge_w: np.ndarray | None = None, k: float = 0.05,
               min_size: int = 10) -> np.ndarray:
    """Felzenszwalb-Huttenlocher graph segmentation. Returns (N,) labels."""
    lib = _load()
    feats = np.ascontiguousarray(feats, np.float32)
    src = np.ascontiguousarray(src, np.uint32)
    dst = np.ascontiguousarray(dst, np.uint32)
    n, d = feats.shape
    labels = np.empty(n, np.int32)
    # keep the converted array alive past the C call (ctypes.data of a
    # temporary would dangle when edge_w needs conversion)
    ew = (np.ascontiguousarray(edge_w, np.float32)
          if edge_w is not None else None)
    w_ptr = ew.ctypes.data if ew is not None else None
    lib.fh_segment(n, d, len(src), feats, src, dst, w_ptr,
                   np.float32(k), min_size, labels)
    return labels.astype(np.int64)


def cutpursuit(feats: np.ndarray, src: np.ndarray, dst: np.ndarray,
               edge_w: np.ndarray | None = None, reg: float = 0.05,
               max_iter: int = 10) -> np.ndarray:
    """L0 cut-pursuit partition (the reference's libcp.cutpursuit slot,
    PartSlip/src/gen_superpoint.py:15,65). Returns (N,) labels."""
    lib = _load()
    feats = np.ascontiguousarray(feats, np.float32)
    src = np.ascontiguousarray(src, np.uint32)
    dst = np.ascontiguousarray(dst, np.uint32)
    n, d = feats.shape
    labels = np.empty(n, np.int32)
    ew = (np.ascontiguousarray(edge_w, np.float32)
          if edge_w is not None else None)
    w_ptr = ew.ctypes.data if ew is not None else None
    lib.cutpursuit(n, d, len(src), feats, src, dst, w_ptr,
                   np.float32(reg), max_iter, labels)
    return labels.astype(np.int64)
