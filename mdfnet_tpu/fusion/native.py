"""ctypes loader for the native fusion cores (native/fusion_core.cpp).

Builds the shared library on first use with g++ (cached next to the source);
falls back to slower pure-numpy implementations when no compiler is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "fusion_core.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libfusion_core.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.zbuffer_elect.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.segment_filter.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def zbuffer_elect(depth: np.ndarray, xy: np.ndarray, violation: np.ndarray,
                  valid: np.ndarray) -> np.ndarray:
    """Elect one depth per ref pixel from scattered candidates.

    Args:
        depth: (M,) candidate depths in the ref camera frame.
        xy: (M, 2) candidate positions, pixel-center (+0.5) convention.
        violation: (M,) int32 occlusion-violation counts.
        valid: (H, W) bool ref-pixel validity.
    Returns:
        (H, W) elected depth, 0 where no candidate landed.
    """
    h, w = valid.shape
    depth = np.ascontiguousarray(depth, np.float32)
    xy = np.ascontiguousarray(xy, np.float32)
    violation = np.ascontiguousarray(violation, np.int32)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)

    lib = _load()
    if lib is not None:
        out = np.zeros((h, w), np.float32)
        lib.zbuffer_elect(_ptr(depth, ctypes.c_float), _ptr(xy, ctypes.c_float),
                          _ptr(violation, ctypes.c_int32),
                          _ptr(valid_u8, ctypes.c_uint8),
                          len(depth), h, w, _ptr(out, ctypes.c_float))
        return out

    # numpy fallback: lexsort by (cell, depth, violation), group-scan
    x = np.rint(xy[:, 0] - 0.5).astype(np.int64)
    y = np.rint(xy[:, 1] - 0.5).astype(np.int64)
    keep = ((depth > 1e-9) & (x >= 0) & (x < w) & (y >= 0) & (y < h))
    keep &= valid_u8[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)].astype(bool)
    cell = (y * w + x)[keep]
    d, v = depth[keep], violation[keep]
    order = np.lexsort((v, d, cell))
    cell, d, v = cell[order], d[order], v[order]
    out = np.zeros(h * w, np.float32)
    starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
    ends = np.r_[starts[1:], len(cell)]
    for s, e in zip(starts, ends):
        rank = np.arange(e - s)
        ok = np.flatnonzero(rank >= v[s:e])
        out[cell[s]] = d[s + ok[0]] if len(ok) else d[e - 1]
    return out.reshape(h, w)


def segment_filter(depth: np.ndarray, window: int = 4,
                   diff_thresh: float = 1e-3, size_thresh: int = 10) -> np.ndarray:
    """Drop small depth-connected segments. Returns (H, W) bool keep-mask."""
    h, w = depth.shape
    depth = np.ascontiguousarray(depth, np.float32)

    lib = _load()
    if lib is not None:
        mask = np.zeros((h, w), np.uint8)
        lib.segment_filter(_ptr(depth, ctypes.c_float), h, w, window,
                           diff_thresh, size_thresh, _ptr(mask, ctypes.c_uint8))
        return mask.astype(bool)

    # numpy fallback: BFS per component (slow; tests only)
    valid = depth >= 1e-9
    seen = ~valid
    mask = valid.copy()
    offsets = [(dy, dx) for dy in range(-window, window + 1)
               for dx in range(-window, window + 1) if (dy, dx) != (0, 0)]
    for sy in range(h):
        for sx in range(w):
            if seen[sy, sx]:
                continue
            comp = [(sy, sx)]
            seen[sy, sx] = True
            head = 0
            while head < len(comp):
                cy, cx = comp[head]
                head += 1
                cd = depth[cy, cx]
                for dy, dx in offsets:
                    ny, nx = cy + dy, cx + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx]:
                        nd = depth[ny, nx]
                        if abs(cd - nd) < diff_thresh * (cd + nd):
                            seen[ny, nx] = True
                            comp.append((ny, nx))
            if len(comp) < size_thresh:
                for cy, cx in comp:
                    mask[cy, cx] = False
    return mask
