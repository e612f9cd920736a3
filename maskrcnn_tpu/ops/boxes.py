"""Box algebra as pure, batched JAX ops.

TPU-native rewrite of the reference box utilities (reference: data.py:86-189).
All functions are shape-polymorphic over leading batch dims, jit/vmap/grad
friendly, and avoid the reference's O(M*N) repeat/tile materialisation in
favour of broadcasting.

Boxes use (y1, x1, y2, x2) layout throughout, matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def clip_boxes(boxes: jnp.ndarray, window) -> jnp.ndarray:
    """Clip boxes to a window (reference: data.py:86-92 boxes_clamp_).

    boxes: [..., 4] (y1, x1, y2, x2)
    window: length-4 (wy1, wx1, wy2, wx2)
    """
    wy1, wx1, wy2, wx2 = [jnp.asarray(w, boxes.dtype) for w in window]
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def scale_boxes(boxes: jnp.ndarray, scale) -> jnp.ndarray:
    """Elementwise scale (reference: data.py:95-100 boxes_scale)."""
    return boxes * jnp.asarray(scale, boxes.dtype)


def box_deltas(boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Regression targets from `boxes` to `gt_boxes`.

    (reference: data.py:103-121 boxes_deltas)
    Returns [..., (dy, dx, log(dh), log(dw))].
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    gt_height = gt_boxes[..., 2] - gt_boxes[..., 0]
    gt_width = gt_boxes[..., 3] - gt_boxes[..., 1]
    gt_center_y = gt_boxes[..., 0] + 0.5 * gt_height
    gt_center_x = gt_boxes[..., 1] + 0.5 * gt_width

    dy = (gt_center_y - center_y) / height
    dx = (gt_center_x - center_x) / width
    dh = jnp.log(gt_height / height)
    dw = jnp.log(gt_width / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def refine_boxes(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply regression deltas to boxes (reference: data.py:124-148).

    boxes: [..., 4] (y1, x1, y2, x2)
    deltas: [..., 4] (dy, dx, log(dh), log(dw))
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    center_y = center_y + deltas[..., 0] * height
    center_x = center_x + deltas[..., 1] * width
    height = height * jnp.exp(deltas[..., 2])
    width = width * jnp.exp(deltas[..., 3])

    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    # Reference computes y2 = y1 + height (not center + h/2); identical
    # in exact arithmetic, kept literal for bit parity.
    y2 = y1 + height
    x2 = x1 + width
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(y2-y1)*(x2-x1); no +1 convention (that lives only in NMS)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix [M, N] (reference: data.py:151-189 boxes_overlaps).

    Broadcasting instead of the reference's repeat/view materialisation:
    on TPU this lowers to one fused VPU loop over the [M, N] tile.
    Zero-area vs zero-area pairs produce 0/0 -> nan exactly like the
    reference; callers mask padded boxes themselves.
    """
    b1 = boxes1[..., :, None, :]  # [M, 1, 4]
    b2 = boxes2[..., None, :, :]  # [1, N, 4]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    intersection = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = area1 + area2 - intersection
    return intersection / union


def encode_boxes(boxes: jnp.ndarray, scale, top, left) -> jnp.ndarray:
    """Original-image boxes -> padded-canvas boxes (reference: data.py:317-328)."""
    boxes = boxes * jnp.asarray(scale, boxes.dtype)
    offset = jnp.asarray([top, left, top, left], boxes.dtype)
    return boxes + offset


def decode_boxes(boxes: jnp.ndarray, scale, top, left) -> jnp.ndarray:
    """Padded-canvas boxes -> original-image boxes (reference: data.py:331-343).

    Keeps the reference's `1 / (scale + 1e-5)` quirk for parity.
    """
    offset = jnp.asarray([top, left, top, left], boxes.dtype)
    boxes = boxes - offset
    inv = 1.0 / (jnp.asarray(scale, boxes.dtype) + 1e-5)
    return boxes * inv
