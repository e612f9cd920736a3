"""Test-only import of the reference's OWN model.py as a full-model oracle.

Extends the compiled-C oracle pattern (tests/geometry_c_oracle.py,
tests/rle_c_oracle.py) from single kernels to the COMPLETE composed
model: the reference's torch `MaskRCNN` (reference model.py:959-1487),
running the reference's own compiled NMS / crop_and_resize kernels, is
imported read-only from /root/reference and driven side by side with
this framework on identical weights. Nothing from the reference is
copied into the repo — the modules are imported from their original
location for the lifetime of the test process only.

Three of the reference's imports don't exist in this image and are
stubbed JUST enough for the inference + target-sampling paths:

* `torchvision` — data.py:16-17 uses `datasets.CocoDetection` (only as
  a base class, never instantiated here) and four PIL-backed transforms
  (Resize / Pad / CenterCrop / ToTensor) from the torchvision-0.2 era
  the reference targets (PIL backend, README.md:59-67). The shims
  reproduce those exact PIL semantics: Resize == PIL bilinear resize,
  Pad == zero-fill border expand, CenterCrop == round-half-up centered
  crop, ToTensor == CHW float/255.
* `skimage` — only `io`/`color`/`measure.find_contours` attribute
  lookups at import time (data.py:19-20, utils.py:18); the functions
  are never called by the oracle paths and raise if reached.
* `maskrcnn` (the C++ extension package) — the reference wrapper
  (c++ext/maskrcnn/__init__.py) is a torch-1.0 legacy
  `autograd.Function`, a construct removed in torch 2.x, so it cannot
  be imported as-is; the shim exposes the same `nms()` /
  `CropFunction(h, w, extrap)(image, boxes, ind)` call surface but
  dispatches straight to the reference's own compiled CPU kernels
  (geometry_c_oracle builds nms_cpu.cpp / crop_cpu.cpp unmodified bar
  the one documented dispatch-macro rename). Forward-only: the oracle
  is used for inference/targets, not training.

All reference `.cuda()` calls are statically guarded by
`config.GPU_COUNT` / `tensor.is_cuda` (verified for the paths used), so
an oracle config with GPU_COUNT=0 keeps everything on CPU with no
monkeypatching of torch itself.

load() returns None (tests skip) when the reference tree or the C
toolchain is unavailable.
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from types import SimpleNamespace
from typing import Optional

import numpy as np

_REF = "/root/reference"

_loaded: Optional[SimpleNamespace] = None
_tried = False


def _stub_torchvision():
    import torch
    from PIL import Image, ImageOps

    tv = types.ModuleType("torchvision")
    ds = types.ModuleType("torchvision.datasets")

    class CocoDetection:  # base class only (data.py:695); not constructed
        def __init__(self, *a, **k):
            raise RuntimeError("oracle stub: CocoDetection is not usable")

    ds.CocoDetection = CocoDetection

    tr = types.ModuleType("torchvision.transforms")

    class Resize:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            h, w = int(self.size[0]), int(self.size[1])
            return img.resize((w, h), Image.BILINEAR)

    class Pad:
        def __init__(self, padding):
            self.padding = tuple(int(p) for p in padding)  # (l, t, r, b)

        def __call__(self, img):
            return ImageOps.expand(img, border=self.padding, fill=0)

    class CenterCrop:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            th, tw = int(self.size[0]), int(self.size[1])
            w, h = img.size
            left = int(round((w - tw) / 2.0))
            top = int(round((h - th) / 2.0))
            return img.crop((left, top, left + tw, top + th))

    class ToTensor:
        def __call__(self, img):
            a = np.asarray(img, dtype=np.float32) / 255.0
            if a.ndim == 2:
                a = a[None]
            else:
                a = a.transpose(2, 0, 1)
            return torch.from_numpy(np.ascontiguousarray(a))

    tr.Resize, tr.Pad, tr.CenterCrop, tr.ToTensor = (
        Resize, Pad, CenterCrop, ToTensor)
    tv.datasets, tv.transforms = ds, tr
    return {"torchvision": tv, "torchvision.datasets": ds,
            "torchvision.transforms": tr}


def _stub_skimage():
    def _unavailable(*a, **k):
        raise RuntimeError("oracle stub: skimage is not available")

    sk = types.ModuleType("skimage")
    io = types.ModuleType("skimage.io")
    color = types.ModuleType("skimage.color")
    measure = types.ModuleType("skimage.measure")
    io.imread = _unavailable
    color.gray2rgb = _unavailable
    measure.find_contours = _unavailable
    sk.io, sk.color, sk.measure = io, color, measure
    return {"skimage": sk, "skimage.io": io, "skimage.color": color,
            "skimage.measure": measure}


def _stub_maskrcnn(geom):
    import torch

    m = types.ModuleType("maskrcnn")

    def nms(dets, threshold):
        return geom.nms_cpu(dets.contiguous().float(), float(threshold))

    class CropFunction:
        """Same call surface as c++ext/maskrcnn/__init__.py:25-57,
        forward-only, dispatching to the reference's compiled
        crop_cpu_forward."""

        def __init__(self, crop_height, crop_width, extrapolation_value=0):
            self.crop_height = int(crop_height)
            self.crop_width = int(crop_width)
            self.extrapolation_value = float(extrapolation_value)

        def __call__(self, image, boxes, box_ind):
            n = boxes.shape[0]
            c = image.shape[1]
            crops = torch.zeros(n, c, self.crop_height, self.crop_width,
                                dtype=torch.float32)
            geom.crop_forward(image.contiguous().float(),
                              boxes.contiguous().float(),
                              box_ind.contiguous().int(),
                              self.extrapolation_value,
                              self.crop_height, self.crop_width, crops)
            return crops

    m.nms = nms
    m.CropFunction = CropFunction
    return {"maskrcnn": m}


_GENERIC = ("config", "utils", "data", "model")


def load() -> Optional[SimpleNamespace]:
    """Import the reference modules (cached). None -> tests skip."""
    global _loaded, _tried
    if _tried:
        return _loaded
    _tried = True
    if not os.path.exists(os.path.join(_REF, "model.py")):
        return None
    from tests import geometry_c_oracle
    geom = geometry_c_oracle.build()
    if geom is None:
        return None

    stubs = {}
    stubs.update(_stub_torchvision())
    stubs.update(_stub_skimage())
    stubs.update(_stub_maskrcnn(geom))

    names = list(stubs) + list(_GENERIC)
    saved = {k: sys.modules.get(k) for k in names}
    sys.modules.update(stubs)
    for name in _GENERIC:
        sys.modules.pop(name, None)
    sys.path.insert(0, _REF)
    try:
        mods = {name: importlib.import_module(name) for name in _GENERIC}
    except Exception as e:  # pragma: no cover - import drift: skip
        print(f"reference oracle import failed: {e}", file=sys.stderr)
        mods = None
    finally:
        sys.path.remove(_REF)
        # The generic names must not shadow anything imported later;
        # model.py keeps its own references to utils/data internally.
        for k in names:
            if saved[k] is not None:
                sys.modules[k] = saved[k]
            else:
                sys.modules.pop(k, None)

    if mods is None:
        return None
    _loaded = SimpleNamespace(config=mods["config"], utils=mods["utils"],
                              data=mods["data"], model=mods["model"],
                              maskrcnn=stubs["maskrcnn"], geom=geom)
    return _loaded


def make_inference_config(ref, image_dim: int = 256):
    """Reference CocoInferenceConfig pinned to CPU + a small canvas."""

    class OracleInferenceConfig(ref.config.CocoInferenceConfig):
        GPU_COUNT = 0  # all .cuda() calls are GPU_COUNT-guarded
        IMAGE_MIN_DIM = image_dim
        IMAGE_MAX_DIM = image_dim

    return OracleInferenceConfig()
