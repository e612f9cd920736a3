"""ctypes bridge to the native RLE kernels (native/rle_kernels.cpp).

Replaces the reference's Cython _mask bridge
(cocoapi/PythonAPI/pycocotools/_mask.pyx) with a plain C ABI + ctypes —
no build-time Python binding dependency. Auto-builds with `make -C
native` if a toolchain is present; everything degrades to the numpy
implementations in rle.py when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librle_kernels.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.rle_encode.argtypes = [u8p, ctypes.c_int64, u32p]
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [u32p, ctypes.c_int, u8p, ctypes.c_int64]
    lib.rle_decode.restype = None
    lib.rle_iou_matrix.argtypes = [u32p, i64p, ctypes.c_int, u32p, i64p,
                                   ctypes.c_int, u8p, f64p]
    lib.rle_iou_matrix.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def encode_counts(flat_mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat_mask, np.uint8)
    out = np.empty(flat.size + 1, np.uint32)
    k = lib.rle_encode(flat, flat.size, out)
    return out[:k].copy()


def decode_counts(counts: np.ndarray, total: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, np.uint32)
    out = np.empty(total, np.uint8)
    lib.rle_decode(counts, len(counts), out, total)
    return out


def iou_matrix(dt_counts: List[np.ndarray], gt_counts: List[np.ndarray],
               iscrowd) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    m, n = len(dt_counts), len(gt_counts)
    dcat = np.ascontiguousarray(
        np.concatenate(dt_counts) if m else np.empty(0), np.uint32)
    gcat = np.ascontiguousarray(
        np.concatenate(gt_counts) if n else np.empty(0), np.uint32)
    doff = np.zeros(m + 1, np.int64)
    np.cumsum([len(c) for c in dt_counts], out=doff[1:])
    goff = np.zeros(n + 1, np.int64)
    np.cumsum([len(c) for c in gt_counts], out=goff[1:])
    crowd = np.ascontiguousarray(
        np.asarray(iscrowd if iscrowd is not None else [0] * n, np.uint8))
    out = np.zeros(m * n, np.float64)
    lib.rle_iou_matrix(dcat, doff, m, gcat, goff, n, crowd, out)
    return out.reshape(m, n)
