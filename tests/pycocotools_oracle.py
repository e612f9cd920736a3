"""Test-only import of the reference's vendored pycocotools as an oracle.

The reference vendors the full cocoapi (reference cocoapi/PythonAPI/
pycocotools/{coco,cocoeval}.py — the exact AP protocol its published
numbers were produced with). Both files are pure Python + numpy except
for `from . import mask`, which wraps the Cython `_mask` extension that
cannot be built here. That import is shimmed with THIS framework's RLE
backend (maskrcnn_tpu/eval/rle.py) — itself already golden-diffed
bit-exact against the reference's own compiled maskApi.c
(tests/test_rle_golden.py). Running the reference's evaluator over the
same RLE backend as ours isolates exactly the seam the per-kernel tests
cannot reach: the matching / accumulate / summarize protocol logic in
eval/cocoeval.py and the index/loadRes logic in eval/coco_index.py.

Nothing is copied into the repo; the modules are imported read-only from
/root/reference for the lifetime of the test process under the private
package name `refpycocotools`.
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from types import SimpleNamespace
from typing import Optional

import numpy as np

_REF_DIR = "/root/reference/cocoapi/PythonAPI/pycocotools"
_PKG = "refpycocotools"

_loaded: Optional[SimpleNamespace] = None
_tried = False


def _mask_shim() -> types.ModuleType:
    """pycocotools.mask surface backed by maskrcnn_tpu.eval.rle.

    List/scalar conventions follow the reference mask.py:74-106: area and
    toBbox accept a single RLE or a list (returning scalar / stacked
    array), decode of a list stacks along axis 2, encode of [h, w, n]
    returns a list.
    """
    from maskrcnn_tpu.eval import rle

    m = types.ModuleType(_PKG + ".mask")

    def encode(bimask):
        if bimask.ndim == 3:
            return [rle.encode(np.ascontiguousarray(bimask[:, :, i]))
                    for i in range(bimask.shape[2])]
        return rle.encode(bimask)

    def decode(rleObjs):
        if isinstance(rleObjs, dict):
            return rle.decode(rleObjs)
        return np.stack([rle.decode(r) for r in rleObjs], axis=2)

    def area(rleObjs):
        if isinstance(rleObjs, dict):
            return rle.area(rleObjs)
        return np.asarray([rle.area(r) for r in rleObjs])

    def toBbox(rleObjs):
        if isinstance(rleObjs, dict):
            return rle.to_bbox(rleObjs)
        return np.stack([rle.to_bbox(r) for r in rleObjs])

    m.encode = encode
    m.decode = decode
    m.area = area
    m.toBbox = toBbox
    m.merge = lambda rles, intersect=0: rle.merge(rles, bool(intersect))
    m.frPyObjects = rle.fr_py_objects
    m.iou = rle.iou
    return m


def load() -> Optional[SimpleNamespace]:
    """Import the vendored COCO/COCOeval (cached). None -> tests skip."""
    global _loaded, _tried
    if _tried:
        return _loaded
    _tried = True
    if not os.path.isdir(_REF_DIR):
        return None

    pkg = types.ModuleType(_PKG)
    pkg.__path__ = [_REF_DIR]
    sys.modules[_PKG] = pkg
    sys.modules[_PKG + ".mask"] = _mask_shim()
    try:
        import matplotlib
        matplotlib.use("Agg")  # coco.py imports pyplot at module scope
        coco_mod = importlib.import_module(_PKG + ".coco")
        cocoeval_mod = importlib.import_module(_PKG + ".cocoeval")
    except Exception as e:  # pragma: no cover - import drift: skip
        print(f"pycocotools oracle import failed: {e}", file=sys.stderr)
        for k in (_PKG, _PKG + ".mask", _PKG + ".coco", _PKG + ".cocoeval"):
            sys.modules.pop(k, None)
        return None

    # numpy compat: the vendored Params passes a float `num` to
    # np.linspace (cocoeval.py:507-508), which old numpy accepted and
    # current numpy rejects. Run the reference's own code under a scoped
    # shim that coerces num to int exactly as old numpy did.
    _orig_set = cocoeval_mod.Params.setDetParams

    def _set_det_params(self):
        real = np.linspace

        def compat(start, stop, num=50, **kw):
            return real(start, stop, int(round(float(num))), **kw)

        np.linspace = compat
        try:
            _orig_set(self)
        finally:
            np.linspace = real

    cocoeval_mod.Params.setDetParams = _set_det_params

    # the keypoint Params use the same float-num np.linspace calls
    # (cocoeval.py:514-523) — same scoped coercion
    _orig_set_kp = cocoeval_mod.Params.setKpParams

    def _set_kp_params(self):
        real = np.linspace

        def compat(start, stop, num=50, **kw):
            return real(start, stop, int(round(float(num))), **kw)

        np.linspace = compat
        try:
            _orig_set_kp(self)
        finally:
            np.linspace = real

    cocoeval_mod.Params.setKpParams = _set_kp_params

    # numpy compat #2: accumulate() uses the `np.float` alias removed in
    # numpy 1.24 (cocoeval.py:379-380). Restore it (== builtin float,
    # exactly what the alias was) only while the reference code runs.
    _orig_acc = cocoeval_mod.COCOeval.accumulate

    def _accumulate(self, *a, **kw):
        np.float = float
        try:
            return _orig_acc(self, *a, **kw)
        finally:
            del np.float

    cocoeval_mod.COCOeval.accumulate = _accumulate

    _loaded = SimpleNamespace(COCO=coco_mod.COCO,
                              COCOeval=cocoeval_mod.COCOeval,
                              coco=coco_mod, cocoeval=cocoeval_mod)
    return _loaded
