"""Test-only ctypes wrapper around the canonical COCO maskApi.c.

Compiles the reference's vendored C (read-only source at
/root/reference/cocoapi/common/maskApi.c — the exact code pycocotools
wraps) into a throwaway shared object under /tmp and exposes the pieces
needed to golden-diff maskrcnn_tpu.eval.rle. Nothing from the C source
is copied into this repo; it is linked as an external oracle, the same
way a pycocotools wheel would be used if one existed in this image.

Returns None from build() when the reference tree or a C compiler is
unavailable, so the golden tests skip instead of failing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

_REF_C = "/root/reference/cocoapi/common/maskApi.c"
_REF_INC = "/root/reference/cocoapi/common"

_siz = ctypes.c_ulong
_uint = ctypes.c_uint32
_byte = ctypes.c_uint8


class _CRLE(ctypes.Structure):
    _fields_ = [("h", _siz), ("w", _siz), ("m", _siz),
                ("cnts", ctypes.POINTER(_uint))]


_lib_cache: Optional[object] = None
_lib_tried = False


def _compile() -> Optional[str]:
    if not os.path.exists(_REF_C):
        return None
    so = os.path.join(tempfile.gettempdir(),
                      f"libmaskapi_golden_{os.getuid()}.so")
    if os.path.exists(so) and os.path.getmtime(so) > os.path.getmtime(_REF_C):
        return so
    for cc in ("cc", "gcc", "g++"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-o", so, _REF_C,
                 "-I", _REF_INC, "-lm"],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return so
        except FileNotFoundError:
            continue
    return None


def build():
    """CDLL with argtypes set, or None (=> skip golden tests)."""
    global _lib_cache, _lib_tried
    if _lib_tried:
        return _lib_cache
    _lib_tried = True
    so = _compile()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    P = ctypes.POINTER
    lib.rleInit.argtypes = [P(_CRLE), _siz, _siz, _siz, P(_uint)]
    lib.rleFree.argtypes = [P(_CRLE)]
    lib.rleEncode.argtypes = [P(_CRLE), P(_byte), _siz, _siz, _siz]
    lib.rleDecode.argtypes = [P(_CRLE), P(_byte), _siz]
    lib.rleMerge.argtypes = [P(_CRLE), P(_CRLE), _siz, ctypes.c_int]
    lib.rleArea.argtypes = [P(_CRLE), _siz, P(_uint)]
    lib.rleIou.argtypes = [P(_CRLE), P(_CRLE), _siz, _siz, P(_byte),
                           P(ctypes.c_double)]
    lib.rleToBbox.argtypes = [P(_CRLE), P(ctypes.c_double), _siz]
    lib.rleFrPoly.argtypes = [P(_CRLE), P(ctypes.c_double), _siz, _siz,
                              _siz]
    lib.rleToString.argtypes = [P(_CRLE)]
    lib.rleToString.restype = ctypes.c_void_p  # malloc'd char*
    lib.rleFrString.argtypes = [P(_CRLE), ctypes.c_char_p, _siz, _siz]
    lib.bbIou.argtypes = [P(ctypes.c_double), P(ctypes.c_double), _siz,
                          _siz, P(_byte), P(ctypes.c_double)]
    _lib_cache = lib
    return lib


class Oracle:
    """Pythonic view of the canonical C, mirroring eval/rle.py's API."""

    def __init__(self, lib):
        self.lib = lib
        self._libc = ctypes.CDLL(None)
        self._libc.free.argtypes = [ctypes.c_void_p]

    # -- helpers ---------------------------------------------------------
    def _rle_from_counts(self, counts: np.ndarray, h: int, w: int) -> _CRLE:
        counts = np.ascontiguousarray(counts, np.uint32)
        r = _CRLE()
        self.lib.rleInit(ctypes.byref(r), h, w, len(counts),
                         counts.ctypes.data_as(ctypes.POINTER(_uint)))
        return r

    def _counts(self, r: _CRLE) -> np.ndarray:
        return np.ctypeslib.as_array(r.cnts, shape=(r.m,)).copy() \
            if r.m else np.zeros(0, np.uint32)

    def _free(self, *rles: _CRLE):
        for r in rles:
            self.lib.rleFree(ctypes.byref(r))

    # -- API -------------------------------------------------------------
    def encode_counts(self, mask: np.ndarray) -> np.ndarray:
        h, w = mask.shape
        flat = np.ascontiguousarray(mask.flatten(order="F"), np.uint8)
        r = _CRLE()
        self.lib.rleEncode(ctypes.byref(r),
                           flat.ctypes.data_as(ctypes.POINTER(_byte)),
                           h, w, 1)
        out = self._counts(r)
        self._free(r)
        return out

    def decode(self, counts: np.ndarray, h: int, w: int) -> np.ndarray:
        r = self._rle_from_counts(counts, h, w)
        buf = np.zeros(h * w, np.uint8)
        self.lib.rleDecode(ctypes.byref(r),
                           buf.ctypes.data_as(ctypes.POINTER(_byte)), 1)
        self._free(r)
        return buf.reshape((h, w), order="F")

    def merge_counts(self, counts_list: List[np.ndarray], h: int, w: int,
                     intersect: bool) -> np.ndarray:
        n = len(counts_list)
        arr = (_CRLE * n)()
        for i, c in enumerate(counts_list):
            arr[i] = self._rle_from_counts(c, h, w)
        out = _CRLE()
        self.lib.rleMerge(arr, ctypes.byref(out), n, int(intersect))
        res = self._counts(out)
        self._free(out, *arr)
        return res

    def area(self, counts: np.ndarray, h: int, w: int) -> int:
        r = self._rle_from_counts(counts, h, w)
        a = (_uint * 1)()
        self.lib.rleArea(ctypes.byref(r), 1, a)
        self._free(r)
        return int(a[0])

    def to_bbox(self, counts: np.ndarray, h: int, w: int) -> np.ndarray:
        r = self._rle_from_counts(counts, h, w)
        bb = np.zeros(4, np.float64)
        self.lib.rleToBbox(ctypes.byref(r),
                           bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           1)
        self._free(r)
        return bb

    def iou(self, dts: List[np.ndarray], gts: List[np.ndarray], h: int,
            w: int, iscrowd: Sequence[int]) -> np.ndarray:
        m, n = len(dts), len(gts)
        da = (_CRLE * m)()
        ga = (_CRLE * n)()
        for i, c in enumerate(dts):
            da[i] = self._rle_from_counts(c, h, w)
        for i, c in enumerate(gts):
            ga[i] = self._rle_from_counts(c, h, w)
        crowd = np.ascontiguousarray(iscrowd, np.uint8)
        o = np.zeros(n * m, np.float64)
        self.lib.rleIou(da, ga, m, n,
                        crowd.ctypes.data_as(ctypes.POINTER(_byte)),
                        o.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        self._free(*da, *ga)
        # buffer layout o[g*m + d] -> [m, n] dt-major to match eval/rle.py
        return o.reshape(n, m).T

    def bb_iou(self, dt: np.ndarray, gt: np.ndarray,
               iscrowd: Sequence[int]) -> np.ndarray:
        dt = np.ascontiguousarray(dt, np.float64)
        gt = np.ascontiguousarray(gt, np.float64)
        m, n = len(dt), len(gt)
        crowd = np.ascontiguousarray(iscrowd, np.uint8)
        o = np.zeros(n * m, np.float64)
        self.lib.bbIou(dt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       gt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       m, n,
                       crowd.ctypes.data_as(ctypes.POINTER(_byte)),
                       o.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return o.reshape(n, m).T

    def poly_counts(self, poly: Sequence[float], h: int,
                    w: int) -> np.ndarray:
        xy = np.ascontiguousarray(poly, np.float64)
        r = _CRLE()
        self.lib.rleFrPoly(
            ctypes.byref(r),
            xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(xy) // 2, h, w)
        out = self._counts(r)
        self._free(r)
        return out

    def to_string(self, counts: np.ndarray, h: int, w: int) -> bytes:
        r = self._rle_from_counts(counts, h, w)
        p = self.lib.rleToString(ctypes.byref(r))
        s = ctypes.string_at(p)
        self._libc.free(p)
        self._free(r)
        return s

    def from_string(self, s: bytes, h: int, w: int) -> np.ndarray:
        r = _CRLE()
        self.lib.rleFrString(ctypes.byref(r), s, h, w)
        out = self._counts(r)
        self._free(r)
        return out


def get_oracle() -> Optional[Oracle]:
    lib = build()
    return Oracle(lib) if lib is not None else None
