"""Pyramid anchor generation.

TPU-native rewrite of the reference anchor generator
(reference: utils.py:116-291 create_anchors / create_pyramid_anchors).

Anchors are a pure function of the (static) config, so we generate them in
numpy at trace time; under `jit` they constant-fold into the compiled
executable and live in HBM — there is no per-step host transfer, unlike the
reference which rebuilds them both at model build (model.py:991) and in the
data loader (data.py:705).

Ordering matters: anchors must be ordered (level, y, x, ratio) to line up
with the RPN head's [B, H, W, A*k] -> [B, H*W*A, k] reshape
(reference: model.py:627-641).
"""

from __future__ import annotations

import numpy as np


def generate_level_anchors(scale, ratios, shape, feature_stride,
                           anchor_stride) -> np.ndarray:
    """Anchors for one pyramid level (reference: utils.py:116-220).

    scale: anchor side in pixels (one scalar per level).
    ratios: width/height ratios.
    shape: (h, w) of the feature map.
    Returns [h*w*len(ratios), 4] float32 (y1, x1, y2, x2), ordered
    (y, x, ratio).

    Computed in float64 then cast, exactly like the reference (numpy
    f64 at utils.py:116-220, `.float()` at model.py:991-995) — the
    anchor grid is then BIT-equal to the reference's, which keeps the
    composed proposal layer free of last-ulp decode differences
    (verified by tests/test_reference_model_golden.py).
    """
    ratios = np.asarray(ratios, np.float64)
    scale = np.float64(scale)
    heights = scale / np.sqrt(ratios)  # [A]
    widths = scale * np.sqrt(ratios)   # [A]

    shifts_y = (np.arange(0, shape[0], anchor_stride, dtype=np.float64)
                * feature_stride)  # [H]
    shifts_x = (np.arange(0, shape[1], anchor_stride, dtype=np.float64)
                * feature_stride)  # [W]

    # [H, W, A] broadcasting; reshape order (y, x, ratio).
    cy = shifts_y[:, None, None] + np.zeros(
        (1, shifts_x.shape[0], ratios.shape[0]), np.float64)
    cx = shifts_x[None, :, None] + np.zeros(
        (shifts_y.shape[0], 1, ratios.shape[0]), np.float64)
    h = np.broadcast_to(heights[None, None, :], cy.shape)
    w = np.broadcast_to(widths[None, None, :], cy.shape)

    boxes = np.stack(
        [cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], axis=-1)
    return boxes.reshape(-1, 4).astype(np.float32)


def generate_pyramid_anchors(scales, ratios, feature_shapes, feature_strides,
                             anchor_stride) -> np.ndarray:
    """All-level anchors, scale[i] on level i (reference: utils.py:223-291).

    For the 1024x1024 COCO config this returns [261888, 4].
    """
    anchors = [
        generate_level_anchors(scales[i], ratios, feature_shapes[i],
                               feature_strides[i], anchor_stride)
        for i in range(len(scales))
    ]
    return np.concatenate(anchors, axis=0)


def config_anchors(config) -> np.ndarray:
    """Anchors for a Config (matches reference model.py:991-995)."""
    return generate_pyramid_anchors(
        config.RPN_ANCHOR_SCALES, config.RPN_ANCHOR_RATIOS,
        config.BACKBONE_SHAPES, config.BACKBONE_STRIDES,
        config.RPN_ANCHOR_STRIDE)
