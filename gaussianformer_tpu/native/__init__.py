"""Native (C++) host-side data-path kernels, loaded via ctypes.

Builds `occ_codec.cpp` with g++ on first use (cached next to the source);
every entry point has a numpy fallback so the package works without a
compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_occ_codec.so")
_SRC = os.path.join(_DIR, "occ_codec.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.decode_occupancy.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
        lib.normalize_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.occ_meshgrid.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float]
        _LIB = lib
    except Exception:  # pragma: no cover - toolchain missing
        _LIB = None
    return _LIB


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode_occupancy(records: np.ndarray, grid=(200, 200, 16),
                     empty_label: int = 17):
    """Sparse [K, 4] records → (dense int32 labels, uint8 camera mask)."""
    lib = _load()
    x, y, z = grid
    if lib is None:
        label = np.full(grid, empty_label, np.int32)
        r = records[(records[:, 0] >= 0) & (records[:, 0] < x)
                    & (records[:, 1] >= 0) & (records[:, 1] < y)
                    & (records[:, 2] >= 0) & (records[:, 2] < z)]
        label[r[:, 0], r[:, 1], r[:, 2]] = r[:, 3]
        return label, (label != 0).astype(np.uint8)
    records = np.ascontiguousarray(records, np.int32)
    label = np.empty(grid, np.int32)
    mask = np.empty(grid, np.uint8)
    lib.decode_occupancy(
        _ptr(records, ctypes.c_int32), records.shape[0],
        _ptr(label, ctypes.c_int32), _ptr(mask, ctypes.c_uint8),
        x, y, z, empty_label)
    return label, mask


def normalize_image(img_u8: np.ndarray, mean, std) -> np.ndarray:
    """uint8 [H, W, 3] → float32 (img - mean) / std in one pass."""
    lib = _load()
    mean = np.asarray(mean, np.float32)
    inv_std = (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    if lib is None:
        return (img_u8.astype(np.float32) - mean) * inv_std
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    out = np.empty(img_u8.shape, np.float32)
    lib.normalize_image(
        _ptr(img_u8, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        img_u8.shape[0] * img_u8.shape[1],
        _ptr(mean, ctypes.c_float), _ptr(inv_std, ctypes.c_float))
    return out


def occ_meshgrid_native(pc_min=(-50.0, -50.0, -5.0), grid=(200, 200, 16),
                        reso: float = 0.5) -> np.ndarray:
    lib = _load()
    x, y, z = grid
    if lib is None:
        from ..data.transforms import occ_meshgrid
        pc_range = (pc_min[0], pc_min[1], pc_min[2],
                    pc_min[0] + x * reso, pc_min[1] + y * reso,
                    pc_min[2] + z * reso)
        return occ_meshgrid(pc_range, grid, reso)
    out = np.empty(grid + (3,), np.float32)
    lib.occ_meshgrid(_ptr(out, ctypes.c_float), x, y, z,
                     pc_min[0], pc_min[1], pc_min[2], reso)
    return out
