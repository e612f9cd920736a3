"""Host-side image/box/mask codecs (PIL parity with the reference).

These run on the host around the jitted graph: resize+pad to the square
canvas before upload, and undo on download. They reproduce the reference
codecs bit-for-bit where AP depends on it:

* encode_image <- data.py:191-223 / utils.py:42-90 resize_image: scale up
  so min side >= IMAGE_MIN_DIM but cap the long side at IMAGE_MAX_DIM,
  PIL bilinear, centre-pad with zeros; returns (canvas, window, scale);
* decode_boxes <- data.py:331-343 (including the /(scale+1e-5) quirk);
* decode_masks <- data.py:265-284: centre-crop the window then resize the
  full canvas mask to the original size (the reference's blurry two-step,
  kept because AP parity depends on it).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def resize_image(image: np.ndarray, min_dim: int, max_dim: int,
                 canvas_shape: Tuple[int, int] = None,
                 scale_mult: float = 1.0
                 ) -> Tuple[np.ndarray, Tuple[int, int, int, int], float]:
    """uint8 HxWx3 -> (canvas [CH, CW, 3] uint8, window, scale).

    Default square canvas (CH = CW = max_dim) reproduces the reference
    protocol (data.py:191-223): upscale so min side >= min_dim, cap the
    long side at max_dim, center-pad. With `canvas_shape=(CH, CW)`
    (Config.IMAGE_CANVAS) the cap applies per axis so the image fits the
    rectangle — smaller canvases convolve fewer padded-zero pixels.
    window = (y1, x1, y2, x2) of the real image inside the canvas.

    scale_mult: training-time scale jitter (data/augment.py) applied to
    the protocol scale, still capped by the canvas fit and floored so at
    least 8 px of the short side survive.
    """
    h, w = image.shape[:2]
    ch, cw = canvas_shape if canvas_shape is not None else (max_dim,
                                                           max_dim)
    scale = max(1.0, min_dim / min(h, w))
    if scale_mult != 1.0:
        scale = max(scale * scale_mult, 8.0 / min(h, w))
    if round(h * scale) > ch or round(w * scale) > cw:
        scale = min(ch / h, cw / w)
    if scale != 1.0:
        nh, nw = round(h * scale), round(w * scale)
        img = Image.fromarray(image).resize((nw, nh), Image.BILINEAR)
        image = np.asarray(img)
    else:
        nh, nw = h, w
    top = (ch - nh) // 2
    left = (cw - nw) // 2
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[top:top + nh, left:left + nw] = image
    return canvas, (top, left, top + nh, left + nw), scale


def encode_boxes(boxes: np.ndarray, scale: float,
                 window) -> np.ndarray:
    """Original coords -> canvas coords (data.py:317-328)."""
    top, left = window[0], window[1]
    out = boxes * scale
    out[:, 0] += top
    out[:, 1] += left
    out[:, 2] += top
    out[:, 3] += left
    return out


def decode_boxes(boxes: np.ndarray, scale: float, window) -> np.ndarray:
    """Canvas coords -> original coords (data.py:331-343 incl. the
    scale+1e-5 quirk)."""
    top, left = window[0], window[1]
    out = boxes.astype(np.float64).copy()
    out[:, 0] -= top
    out[:, 1] -= left
    out[:, 2] -= top
    out[:, 3] -= left
    return out / (scale + 1e-5)


def encode_masks(masks: np.ndarray, scale: float, window,
                 max_dim: int,
                 canvas_shape: Tuple[int, int] = None) -> np.ndarray:
    """Per-instance masks [N, H, W] {0,1} -> canvas masks [N, CH, CW]
    (data.py:246-262; square CH = CW = max_dim by default)."""
    n = masks.shape[0]
    ch, cw = canvas_shape if canvas_shape is not None else (max_dim,
                                                           max_dim)
    out = np.zeros((n, ch, cw), np.uint8)
    top, left = window[0], window[1]
    for i in range(n):
        img = Image.fromarray(masks[i].astype(np.uint8) * 255, "L")
        nh = round(img.height * scale)
        nw = round(img.width * scale)
        img = img.resize((nw, nh), Image.BILINEAR)
        arr = np.asarray(img) > 127
        h = min(nh, ch - top)
        w = min(nw, cw - left)
        out[i, top:top + h, left:left + w] = arr[:h, :w]
    return out


def decode_masks(masks: np.ndarray, scale: float, window,
                 orig_h: int, orig_w: int) -> np.ndarray:
    """Canvas masks [N, D, D] bool -> original-size masks [N, oh, ow]
    (data.py:265-284: crop window, PIL-resize the whole mask)."""
    top, left, bottom, right = window
    n = masks.shape[0]
    out = np.zeros((n, orig_h, orig_w), np.uint8)
    for i in range(n):
        crop = (masks[i, top:bottom, left:right]).astype(np.uint8) * 255
        img = Image.fromarray(crop, "L").resize((orig_w, orig_h),
                                                Image.BILINEAR)
        out[i] = (np.asarray(img) > 127).astype(np.uint8)
    return out
