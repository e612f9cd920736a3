"""Multilevel RoIAlign as one fused gather — no per-level host loop.

TPU-native replacement for the reference's crop_and_resize extension plus
the Python level-loop around it (reference: model.py:276-393 roi_align;
c++ext/maskrcnn/csrc/cpu/crop_cpu.cpp:13-116 crop_per_box).

Semantics preserved exactly:
* FPN level routing `4 + log2(sqrt(h*w) / (224/sqrt(image_area)))`,
  rounded (half-to-even like torch.round) and clamped to [2, 5]
  (model.py:335-338);
* tf.crop_and_resize sampling: the pooling grid spans the box with
  `(image_size - 1)` scaling, i.e. align_corners=True, ONE bilinear sample
  per output cell — not the 4-sample RoIAlign (crop_cpu.cpp:52-61,
  model.py:360-367);
* out-of-range sample points produce extrapolation_value=0
  (crop_cpu.cpp:63-74);
* no gradient to the boxes (c++ext/maskrcnn/__init__.py:48-57 returns
  grad only for the image; model.py:358 detaches boxes).

Design: instead of looping over pyramid levels and crop-calling each
(model.py:347-376) then re-sorting (383-387), we flatten all four levels
into one [sum(H_l*W_l), C] row table and compute, per box and output cell,
a flat row index from (level, y, x). One XLA gather serves every box at
every level simultaneously; order is the input box order by construction,
so no re-sort. The backward pass is XLA's scatter-add transpose of the
gather — the hand-written CUDA atomicAdd backward (crop_cuda.cu:90-170)
falls out of `jax.grad` for free.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def roi_levels(boxes: jnp.ndarray, image_shape) -> jnp.ndarray:
    """FPN level index (0-based: P2=0..P5=3) per box (model.py:335-338).

    boxes: [..., 4] normalized (y1, x1, y2, x2).
    """
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    image_area = float(image_shape[0]) * float(image_shape[1])
    # 4 + log2(sqrt(hw) / (224/sqrt(area))); log2(0) -> -inf, clipped.
    lvl = 4.0 + jnp.log2(
        jnp.sqrt(h * w) / (224.0 / np.sqrt(image_area)))
    lvl = jnp.clip(jnp.round(lvl), 2.0, 5.0)
    return (lvl - 2.0).astype(jnp.int32)


def multilevel_roi_align(features: Sequence[jnp.ndarray],
                         boxes: jnp.ndarray,
                         pool_size: int,
                         image_shape) -> jnp.ndarray:
    """Pooled crops from the right pyramid level for each box.

    features: list of [H_l, W_l, C] arrays (P2..P5, single image, NHWC).
    boxes: [N, 4] normalized (y1, x1, y2, x2). Zero-padded rows route to
        P2 and pool zeros via extrapolation; callers mask downstream.
    pool_size: output side (7 for the box head, 14 for the mask head).
    Returns [N, pool_size, pool_size, C] in the input box order.
    """
    lvl = roi_levels(boxes, image_shape)
    return _crop_from_levels(features, boxes, pool_size, lvl)


def _crop_from_levels(features: Sequence[jnp.ndarray],
                      boxes: jnp.ndarray,
                      pool_size: int,
                      lvl: jnp.ndarray) -> jnp.ndarray:
    c = features[0].shape[-1]
    heights = np.array([f.shape[0] for f in features], np.float32)
    widths = np.array([f.shape[1] for f in features], np.float32)
    row_offsets = np.concatenate(
        [[0], np.cumsum([f.shape[0] * f.shape[1] for f in features])])

    flat = jnp.concatenate(
        [f.reshape(-1, c) for f in features], axis=0)  # [R, C]

    h_max = jnp.asarray(heights - 1.0)[lvl]                    # [N]
    w_max = jnp.asarray(widths - 1.0)[lvl]
    lvl_w = jnp.asarray(widths)[lvl]
    lvl_off = jnp.asarray(row_offsets[:-1].astype(np.float32))[lvl]
    return _crop_core(flat, boxes, pool_size, h_max, w_max, lvl_w, lvl_off)


def _crop_core(flat: jnp.ndarray, boxes: jnp.ndarray, pool_size: int,
               h_max: jnp.ndarray, w_max: jnp.ndarray,
               lvl_w: jnp.ndarray, lvl_off: jnp.ndarray) -> jnp.ndarray:
    """Shared crop kernel over a flattened [R, C] row table.

    h_max/w_max/lvl_w/lvl_off: per-box source-plane geometry [N].
    """
    assert pool_size > 1
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))
    c = flat.shape[-1]

    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    p = jnp.arange(pool_size, dtype=jnp.float32) / (pool_size - 1)  # [P]

    # Sample points (crop_cpu.cpp:52-61): in_y = y1*(H-1) + p*(y2-y1)*(H-1)
    in_y = (y1[:, None] + p[None, :] * (y2 - y1)[:, None]) * h_max[:, None]
    in_x = (x1[:, None] + p[None, :] * (x2 - x1)[:, None]) * w_max[:, None]

    out_y = (in_y < 0.0) | (in_y > h_max[:, None])   # [N, P]
    out_x = (in_x < 0.0) | (in_x > w_max[:, None])

    y0 = jnp.floor(in_y)
    x0 = jnp.floor(in_x)
    y_lerp = in_y - y0                                # [N, P]
    x_lerp = in_x - x0
    # ceil == floor + (lerp > 0); clamp keeps indices legal when the
    # sample point is outside (those cells are zeroed by the mask anyway).
    y0c = jnp.clip(y0, 0.0, h_max[:, None])
    x0c = jnp.clip(x0, 0.0, w_max[:, None])
    y1c = jnp.clip(jnp.ceil(in_y), 0.0, h_max[:, None])
    x1c = jnp.clip(jnp.ceil(in_x), 0.0, w_max[:, None])

    # Flat row index per (box, py, px, corner).
    def flat_idx(yy, xx):
        # yy: [N, P] (rows), xx: [N, P] (cols) -> [N, P, P]
        return (lvl_off[:, None, None]
                + yy[:, :, None] * lvl_w[:, None, None]
                + xx[:, None, :]).astype(jnp.int32)

    wy = y_lerp[:, :, None]                            # [N, P, 1]
    wx = x_lerp[:, None, :]                            # [N, 1, P]

    # Accumulate the 4 corner gathers one at a time instead of stacking
    # a [N, P, P, 4, C] tensor — 4x lower peak HBM. Interpolation runs in
    # the feature dtype (bf16 on TPU: the heads consume bf16 anyway).
    n, p = boxes.shape[0], int(wy.shape[1])
    shape = (n, p, p)
    # integer sources (e.g. uint8 gt masks) interpolate in f32; float
    # sources keep their dtype (bf16 features stay bf16)
    cdtype = (flat.dtype if jnp.issubdtype(flat.dtype, jnp.floating)
              else jnp.float32)

    def corner(yy, xx, w):
        g = jnp.take(flat, flat_idx(yy, xx).reshape(-1), axis=0)
        g = g.reshape(shape + (c,)).astype(cdtype)
        return g * w[..., None].astype(cdtype)

    out = corner(y0c, x0c, (1.0 - wy) * (1.0 - wx))
    out = out + corner(y0c, x1c, (1.0 - wy) * wx)
    out = out + corner(y1c, x0c, wy * (1.0 - wx))
    out = out + corner(y1c, x1c, wy * wx)

    inside = jnp.logical_not(out_y[:, :, None] | out_x[:, None, :])
    return jnp.where(inside[..., None], out,
                     jnp.zeros((), out.dtype))


def crop_and_resize(image: jnp.ndarray, boxes: jnp.ndarray,
                    crop_size: int) -> jnp.ndarray:
    """Single-level crop_and_resize (crop_cpu.cpp:13-116) for [H, W, C].

    Used for mask-target extraction during training
    (reference: model.py:501-507 crops gt masks to 28x28).
    boxes: [N, 4] normalized. Returns [N, crop_size, crop_size, C].
    """
    lvl = jnp.zeros((boxes.shape[0],), jnp.int32)
    return _crop_from_levels([image], boxes, crop_size, lvl)


def indexed_crop_and_resize(images: jnp.ndarray, boxes: jnp.ndarray,
                            box_indices: jnp.ndarray,
                            crop_size: int) -> jnp.ndarray:
    """crop_and_resize with a per-box image index (the reference op's full
    signature: c++ext/maskrcnn/__init__.py:25-57 CropFunction(image, boxes,
    box_ind)). Used for training mask targets where each sampled RoI crops
    its assigned gt instance's mask (reference: model.py:497-503).

    images: [G, H, W, C]; boxes: [N, 4] normalized; box_indices: [N] int32
    in [0, G). Returns [N, crop_size, crop_size, C].
    """
    g, h, w, c = images.shape
    # Treat the G images as G identically-shaped "levels" of one flat
    # row table; the per-box level is the image index.
    heights = np.full((g,), h, np.float32)
    widths = np.full((g,), w, np.float32)
    offsets = np.arange(g, dtype=np.float32) * (h * w)
    return _crop_core(images.reshape(-1, c), boxes, crop_size,
                      jnp.asarray(heights - 1.0)[box_indices],
                      jnp.asarray(widths - 1.0)[box_indices],
                      jnp.asarray(widths)[box_indices],
                      jnp.asarray(offsets)[box_indices])
