"""ctypes bindings for the native host library (csrc/rehrseg_host.cpp).

Builds the shared library on first use (g++ -O3, cached under build/);
every entry point has a pure-Python/numpy fallback, so the framework works
without a compiler. Use `available()` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        root = _repo_root()
        src = os.path.join(root, "csrc", "rehrseg_host.cpp")
        build_dir = os.path.join(root, "build")
        so_path = os.path.join(build_dir, "librehrseg_host.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(src)):
                os.makedirs(build_dir, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", so_path, src, "-lz"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
        except Exception:
            return None

        lib.rh_gunzip.restype = ctypes.c_int64
        lib.rh_gunzip.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64]
        lib.rh_gzip.restype = ctypes.c_int64
        lib.rh_gzip.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.rh_spline_filter_axis.restype = None
        lib.rh_spline_filter_axis.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                              ctypes.c_int64, ctypes.c_int64]
        lib.rh_blur_axis.restype = None
        lib.rh_blur_axis.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64]
        lib.rh_resize_axis.restype = None
        lib.rh_resize_axis.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64]
        lib.rh_zscore.restype = None
        lib.rh_zscore.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def gunzip(data: bytes, hint_size: int | None = None) -> bytes:
    """Native gzip inflate; falls back to the gzip module."""
    lib = _build_and_load()
    if lib is None:
        import gzip
        return gzip.decompress(data)
    inp = np.frombuffer(data, dtype=np.uint8)
    cap = max(hint_size or 0, len(data) * 4, 1 << 16)
    # zlib single-shot is 32-bit; beyond that (or on truncated input, which
    # the C side reports as -1) stream through the gzip module instead
    while cap <= (1 << 32) - 1:
        out = np.empty(cap, dtype=np.uint8)
        n = lib.rh_gunzip(_ptr(inp), len(inp), _ptr(out), cap)
        if n == -2:
            cap = min(cap * 4, (1 << 32) - 1) if cap < (1 << 32) - 1 \
                else (1 << 32)
            continue
        if n < 0:
            break
        return out[:n].tobytes()
    import gzip
    return gzip.decompress(data)


def gzip_compress(data: bytes, level: int = 6) -> bytes:
    lib = _build_and_load()
    if lib is None:
        import gzip
        return gzip.compress(data, compresslevel=level)
    inp = np.frombuffer(data, dtype=np.uint8)
    cap = len(data) + (len(data) >> 1) + 256
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rh_gzip(_ptr(inp), len(inp), _ptr(out), cap, level)
    if n < 0:
        import gzip
        return gzip.compress(data, compresslevel=level)
    return out[:n].tobytes()


def _axis_view(x: np.ndarray, axis: int):
    """(outer, n, inner) factorization of a contiguous array around axis."""
    axis = axis % x.ndim
    outer = int(np.prod(x.shape[:axis], dtype=np.int64))
    n = x.shape[axis]
    inner = int(np.prod(x.shape[axis + 1:], dtype=np.int64))
    return outer, n, inner


def spline_filter_axis(x: np.ndarray, axis: int) -> np.ndarray:
    """Cubic B-spline prefilter along `axis` (scipy spline_filter1d
    order=3 mode='mirror' parity)."""
    lib = _build_and_load()
    if lib is None:
        from scipy.ndimage import spline_filter1d
        return spline_filter1d(x.astype(np.float32), order=3, axis=axis,
                               mode="mirror", output=np.float32)
    out = np.ascontiguousarray(x, dtype=np.float32).copy()
    outer, n, inner = _axis_view(out, axis)
    lib.rh_spline_filter_axis(_ptr(out), outer, n, inner)
    return out


def blur_axis(x: np.ndarray, kernel: np.ndarray, axis: int) -> np.ndarray:
    """'same' zero-padded cross-correlation along `axis`."""
    lib = _build_and_load()
    if lib is None:
        from ..ops.blur import blur_axis_np
        return blur_axis_np(x, kernel, axis)
    xin = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(xin)
    k = np.ascontiguousarray(kernel, dtype=np.float32)
    outer, n, inner = _axis_view(xin, axis)
    lib.rh_blur_axis(_ptr(xin), _ptr(out), _ptr(k), len(k), outer, n, inner)
    return out


def resize_axis_matrix(x: np.ndarray, M: np.ndarray, axis: int) -> np.ndarray:
    """out = M @ x along `axis` (rational B-spline resize apply)."""
    lib = _build_and_load()
    if lib is None:
        return np.moveaxis(np.tensordot(M.astype(np.float64),
                                        np.moveaxis(x, axis, 0), axes=(1, 0)),
                           0, axis).astype(np.float32)
    xin = np.ascontiguousarray(x, dtype=np.float32)
    axis = axis % x.ndim
    m, n = M.shape
    out_shape = list(xin.shape)
    out_shape[axis] = m
    out = np.empty(out_shape, dtype=np.float32)
    Mc = np.ascontiguousarray(M, dtype=np.float32)
    outer, _, inner = _axis_view(xin, axis)
    lib.rh_resize_axis(_ptr(xin), _ptr(out), _ptr(Mc), m, n, outer, inner)
    return out


def zscore_inplace(x: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    if lib is None:
        from ..data.normalize import zscore_normalization
        return zscore_normalization(x)
    assert x.dtype == np.float32 and x.flags.c_contiguous
    lib.rh_zscore(_ptr(x), x.size)
    return x
