"""Test-only build of the reference's own geometry kernels as an oracle.

Compiles the reference's CPU NMS and crop_and_resize extensions
(read-only sources at /root/reference/c++ext/maskrcnn/csrc/cpu/
{nms_cpu.cpp, crop_cpu.cpp} — the exact code `maskrcnn._C` dispatches
to, nms.h:17-29 / crop.h:21-37) into a throwaway torch extension under
/tmp and exposes them for golden-diff tests, following the
tests/rle_c_oracle.py pattern (which found a real floor-vs-trunc bug the
self-authored numpy oracle had missed).

Nothing from the C++ sources is copied into this repo. crop_cpu.cpp
compiles as-is on torch 2.x. nms_cpu.cpp is staged into /tmp with ONE
mechanical API migration — `dets.type()` -> `dets.scalar_type()` in the
AT_DISPATCH_FLOATING_TYPES call (nms_cpu.cpp:75) — which is the exact
drop-in replacement torch's own deprecation message prescribes; the
suppression algorithm is untouched (verified: the staged file differs
from the reference source on that single line).

build() returns None when the reference tree / toolchain is missing, so
the golden tests skip instead of failing.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

_CSRC = "/root/reference/c++ext/maskrcnn/csrc"
_NMS_SRC = f"{_CSRC}/cpu/nms_cpu.cpp"
_CROP_SRC = f"{_CSRC}/cpu/crop_cpu.cpp"

_SHIM = """\
// Test-only pybind shim over the reference's CPU kernels
// (declared in cpu/vision.h).
#include "cpu/vision.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("nms_cpu", &nms_cpu, "reference greedy NMS (CPU)");
  m.def("crop_forward", &crop_cpu_forward,
        "reference crop_and_resize fwd (CPU)");
  m.def("crop_backward", &crop_cpu_backward,
        "reference crop_and_resize bwd (CPU)");
}
"""

_mod = None
_tried = False


def _stage(build_dir: str) -> Optional[str]:
    """Stage nms_cpu.cpp with the single dispatch-macro migration."""
    with open(_NMS_SRC) as f:
        src = f.read()
    old = "AT_DISPATCH_FLOATING_TYPES(dets.type()"
    new = "AT_DISPATCH_FLOATING_TYPES(dets.scalar_type()"
    if old in src:
        src = src.replace(old, new)
    staged = os.path.join(build_dir, "nms_cpu_staged.cpp")
    with open(staged, "w") as f:
        f.write(src)
    return staged


def build():
    """Compile (cached) and return the oracle module, or None to skip."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if not (os.path.exists(_NMS_SRC) and os.path.exists(_CROP_SRC)):
        return None
    try:
        import torch  # noqa: F401
        from torch.utils import cpp_extension
    except ImportError:
        return None
    build_dir = os.path.join("/tmp", f"geom_oracle_{os.getuid()}")
    os.makedirs(os.path.join(build_dir, "build"), exist_ok=True)
    shim = os.path.join(build_dir, "shim.cpp")
    if not os.path.exists(shim) or open(shim).read() != _SHIM:
        with open(shim, "w") as f:
            f.write(_SHIM)
    staged = _stage(build_dir)
    try:
        _mod = cpp_extension.load(
            name="ref_geom_oracle",
            sources=[staged, _CROP_SRC, shim],
            extra_include_paths=[_CSRC],
            build_directory=os.path.join(build_dir, "build"),
            verbose=False)
    except Exception as e:  # toolchain/ABI drift: skip, don't fail
        print(f"geometry oracle build failed: {e}", file=sys.stderr)
        _mod = None
    return _mod


def ref_nms(dets, threshold: float):
    """Reference nms_cpu on pre-sorted [N,5] float (y1,x1,y2,x2,score).

    Returns kept indices (into the given order) as a numpy int array.
    """
    import numpy as np
    import torch
    mod = build()
    keep = mod.nms_cpu(torch.from_numpy(np.ascontiguousarray(dets)),
                       float(threshold))
    return keep.numpy()


def ref_crop(image_nchw, boxes, box_index, crop_h: int, crop_w: int,
             extrapolation: float = 0.0):
    """Reference crop_cpu_forward. image [B,C,H,W] f32, boxes [N,4]
    normalized (y1,x1,y2,x2), box_index [N] int32. Returns [N,C,ch,cw]."""
    import numpy as np
    import torch
    mod = build()
    image_t = torch.from_numpy(np.ascontiguousarray(image_nchw,
                                                    np.float32))
    boxes_t = torch.from_numpy(np.ascontiguousarray(boxes, np.float32))
    idx_t = torch.from_numpy(np.ascontiguousarray(box_index, np.int32))
    n, c = boxes_t.shape[0], image_t.shape[1]
    crops = torch.zeros(n, c, crop_h, crop_w, dtype=torch.float32)
    mod.crop_forward(image_t, boxes_t, idx_t, float(extrapolation),
                     crop_h, crop_w, crops)
    return crops.numpy()


def ref_crop_backward(grads_ncohw, boxes, box_index, batch: int,
                      height: int, width: int):
    """Reference crop_cpu_backward. grads [N,C,ch,cw] f32 -> scatter-add
    into [batch,C,H,W]."""
    import numpy as np
    import torch
    mod = build()
    grads_t = torch.from_numpy(np.ascontiguousarray(grads_ncohw,
                                                    np.float32))
    boxes_t = torch.from_numpy(np.ascontiguousarray(boxes, np.float32))
    idx_t = torch.from_numpy(np.ascontiguousarray(box_index, np.int32))
    c = grads_t.shape[1]
    out = torch.zeros(batch, c, height, width, dtype=torch.float32)
    mod.crop_backward(grads_t, boxes_t, idx_t, out)
    return out.numpy()
