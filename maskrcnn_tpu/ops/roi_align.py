"""Multilevel RoIAlign as one fused patch-gather — no per-level host loop.

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

Design: the pyramid levels are stacked along H into one
[sum(H_l), W_max, C] table (narrow levels zero-padded in W — padding is
never read with nonzero weight, see the clamp note below), and each
output cell fetches its 2x2 bilinear footprint with a single gather of
slice_sizes=(2, 2, C): 4x fewer gather slices than per-corner row
gathers, and each slice is two contiguous 2*C runs. TPU gathers are
VPU element-rate bound, so on bf16 tables the gather additionally runs
through a float32 bitcast view (half the elements for the same bytes,
measured ~20% faster); a custom_vjp keeps the op differentiable — the
backward is the usual scatter-add of the bilinear weights, exactly what
the reference's hand-written CUDA backward computes
(crop_cuda.cu:90-170 atomicAdd).

Corner-clamp equivalence: instead of clamping floor/ceil corners
separately, the patch start is s = clip(floor(p), 0, dim-2) with weight
t = clip(p, 0, dim-1) - s for the (s, s+1) pair. For in-range p this is
identical to (1-frac, frac) on (floor, ceil) with edge clamping: at
p == dim-1 the pair is (dim-2, dim-1) with weights (0, 1). Out-of-range
samples are zeroed by the extrapolation mask regardless.
"""

from __future__ import annotations

import functools
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


def sample_points(boxes: jnp.ndarray, h_max: jnp.ndarray,
                  w_max: jnp.ndarray, pool_size: int):
    """Bilinear sample coordinates per output cell: ([N, P], [N, P]).

    Literal op-order of the reference kernel (crop_cpu.cpp:52-61):
        scale = (y2 - y1) * (H - 1) / (P - 1)
        in_y  = y1 * (H - 1) + y * scale
    Each step rounds once in f32 exactly like the C code, so the
    in-range / extrapolation decision at image-boundary boxes
    (y2 == 1.0 -> in_y == H-1 up to the LAST rounding) lands on the
    same side as the reference's — algebraically-equal forms such as
    (y1 + p*(y2-y1))*(H-1) round differently and flip the boundary
    row/column between sampled and zeroed (caught by
    tests/test_reference_model_golden.py on clipped proposals).
    """
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    steps = jnp.arange(pool_size, dtype=jnp.float32)   # [P]
    # Two compiler rewrites would break per-op IEEE f32 rounding here
    # (both observed on XLA:CPU; either flips the extrapolation flag of
    # exact-boundary samples — x1*63 + 6*ws == 63.0 strict but
    # 63.0000038 rewritten, for a clipped x2 == 1.0 box):
    # * division by a CONSTANT becomes multiplication by its reciprocal
    #   (1 ulp off on ~34% of inputs) — an optimization_barrier on the
    #   divisor makes it a runtime value, keeping a true divide;
    # * the grid mul feeding the final add contracts into an FMA. A
    #   barrier on the mul is NOT enough: fusion DUPLICATES the
    #   producer mul into the add's fusion and LLVM contracts it there
    #   (and `where(pred, x, -x)` pins get sign-folded away). The fix:
    #   add a runtime-opaque ZERO to each mul. Even if the compiler
    #   contracts `a*b + zero` into fma(a, b, 0), that IS the correctly
    #   rounded product; the outer `base + off` then has no mul operand
    #   left to contract with. tests/test_roi_align.py::
    #   test_sample_points_strict_f32 sweeps this bit-exactly against
    #   per-op numpy f32.
    # Cost: two [N, P] adds and an unfused [N] divide — noise.
    inv = jax.lax.optimization_barrier(
        jnp.float32(pool_size - 1))
    zero = jax.lax.optimization_barrier(jnp.float32(0.0))

    hs = (y2 - y1) * h_max / inv                       # [N]
    ws = (x2 - x1) * w_max / inv
    base_y = (y1 * h_max + zero)[:, None]
    base_x = (x1 * w_max + zero)[:, None]
    off_y = steps[None, :] * hs[:, None] + zero
    off_x = steps[None, :] * ws[:, None] + zero
    return base_y + off_y, base_x + off_x


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
    if features[0].shape[-1] < 64:
        # narrow tables (e.g. single-channel gt masks): (2,2,C) patch
        # slices degenerate to a few elements each and the per-slice
        # overhead dominates — the 4-corner row gather wins there
        return _crop_from_levels_rows(features, boxes, pool_size, lvl)
    heights = np.array([f.shape[0] for f in features], np.float32)
    widths = np.array([f.shape[1] for f in features], np.float32)
    w_max_dim = max(f.shape[1] for f in features)
    table = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, w_max_dim - f.shape[1]), (0, 0)))
         for f in features], axis=0)
    h_offsets = np.concatenate([[0], np.cumsum(heights)])[:-1]
    return _crop_core(table, boxes, pool_size,
                      jnp.asarray(heights - 1.0)[lvl],
                      jnp.asarray(widths - 1.0)[lvl],
                      jnp.asarray(h_offsets.astype(np.float32))[lvl])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_patches(table: jnp.ndarray, starts: jnp.ndarray,
                    bitcast: bool) -> jnp.ndarray:
    """[M, 2, 2, C] bilinear footprints from table [HT, WT, C] at starts
    [M, 2] (y, x). Gather indices are clamped in-bounds by XLA."""
    return _gather_patches_fwd(table, starts, bitcast)[0]


def _gather_patches_fwd(table, starts, bitcast):
    ht, wt, c = table.shape
    idx = jnp.concatenate(
        [starts, jnp.zeros((starts.shape[0], 1), starts.dtype)], axis=1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    mode = jax.lax.GatherScatterMode.CLIP
    if bitcast and table.dtype == jnp.bfloat16 and c % 2 == 0:
        t32 = jax.lax.bitcast_convert_type(
            table.reshape(ht, wt, c // 2, 2), jnp.float32)
        g = jax.lax.gather(t32, idx, dn, slice_sizes=(2, 2, c // 2),
                           mode=mode)
        g = jax.lax.bitcast_convert_type(g, jnp.bfloat16)
        out = g.reshape(g.shape[0], 2, 2, c)
    else:
        out = jax.lax.gather(table, idx, dn, slice_sizes=(2, 2, c),
                             mode=mode)
    # the table travels in residuals only for its shape/dtype
    # (zeros_like in bwd) — XLA drops the value dependency
    return out, (starts, table)


def _gather_patches_bwd(bitcast, res, g):
    # Four flat row scatter-adds, not one windowed scatter: XLA lowers
    # [M, C]-row scatters well, while (2,2,C)-window scatter updates
    # measured ~5x slower end-to-end in the training step.
    starts, table = res
    ht, wt, c = table.shape
    flat = jnp.zeros((ht * wt, c), g.dtype)
    sy, sx = starts[:, 0], starts[:, 1]
    for dy in (0, 1):
        for dx in (0, 1):
            rows = (sy + dy) * wt + (sx + dx)
            flat = flat.at[rows].add(g[:, dy, dx, :], mode="drop")
    return flat.reshape(ht, wt, c).astype(table.dtype), None


_gather_patches.defvjp(_gather_patches_fwd, _gather_patches_bwd)


def _crop_core(table: jnp.ndarray, boxes: jnp.ndarray, pool_size: int,
               h_max: jnp.ndarray, w_max: jnp.ndarray,
               h_off: jnp.ndarray) -> jnp.ndarray:
    """Shared crop kernel over an H-stacked [HT, WT, C] table.

    h_max/w_max: per-box source-plane extents minus one [N];
    h_off: per-box row offset of the box's level within the table [N].
    """
    assert pool_size > 1
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))
    c = table.shape[-1]

    in_y, in_x = sample_points(boxes, h_max, w_max, pool_size)

    out_y = (in_y < 0.0) | (in_y > h_max[:, None])   # [N, P]
    out_x = (in_x < 0.0) | (in_x > w_max[:, None])

    ys = jnp.clip(jnp.floor(in_y), 0.0, jnp.maximum(h_max[:, None] - 1, 0))
    xs = jnp.clip(jnp.floor(in_x), 0.0, jnp.maximum(w_max[:, None] - 1, 0))
    ty = jnp.clip(in_y, 0.0, h_max[:, None]) - ys     # [N, P] in [0, 1]
    tx = jnp.clip(in_x, 0.0, w_max[:, None]) - xs

    n, pp = boxes.shape[0], pool_size
    sy = jnp.broadcast_to((ys + h_off[:, None])[:, :, None], (n, pp, pp))
    sx = jnp.broadcast_to(xs[:, None, :], (n, pp, pp))
    starts = jnp.stack([sy.reshape(-1), sx.reshape(-1)],
                       axis=1).astype(jnp.int32)       # [N*P*P, 2]

    # bitcast=False: packing bf16 pairs into f32 wins on a standalone
    # gather (~20%) but the bitcast/reshape materializes a table copy per
    # call inside the fused pipeline, a net loss (measured 1.6 vs 1.1
    # ms/img at 500 RoIs). The 2x2-patch structure alone is the win.
    patches = _gather_patches(table, starts, False)    # [NPP, 2, 2, C]
    cdtype = (table.dtype if jnp.issubdtype(table.dtype, jnp.floating)
              else jnp.float32)
    patches = patches.reshape(n, pp, pp, 2, 2, c).astype(cdtype)

    wy = jnp.stack([1.0 - ty, ty], axis=-1)            # [N, P, 2]
    wx = jnp.stack([1.0 - tx, tx], axis=-1)
    w = (wy[:, :, None, :, None] * wx[:, None, :, None, :])  # [N,P,P,2,2]
    out = (patches * w[..., None].astype(cdtype)).sum(axis=(3, 4))

    inside = jnp.logical_not(out_y[:, :, None] | out_x[:, None, :])
    return jnp.where(inside[..., None], out, jnp.zeros((), out.dtype))


def _crop_from_levels_rows(features: Sequence[jnp.ndarray],
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
    return _crop_core_rows(flat, boxes, pool_size, h_max, w_max, lvl_w, lvl_off)


def _crop_core_rows(flat: jnp.ndarray, boxes: jnp.ndarray, pool_size: int,
               h_max: jnp.ndarray, w_max: jnp.ndarray,
               lvl_w: jnp.ndarray, lvl_off: jnp.ndarray) -> jnp.ndarray:
    """Shared crop kernel over a flattened [R, C] row table.

    h_max/w_max/lvl_w/lvl_off: per-box source-plane geometry [N].
    """
    assert pool_size > 1
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))
    c = flat.shape[-1]

    in_y, in_x = sample_points(boxes, h_max, w_max, pool_size)

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
    return _crop_from_levels_rows([image], boxes, crop_size, lvl)


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
    # The G images are G identically-shaped "levels" of one flat row
    # table; the per-box level is the image index. Row core: gt masks
    # are single-channel, where patch slices are slower (see
    # multilevel_roi_align).
    heights = np.full((g,), h, np.float32)
    widths = np.full((g,), w, np.float32)
    offsets = np.arange(g, dtype=np.float32) * (h * w)
    return _crop_core_rows(images.reshape(-1, c), boxes, crop_size,
                           jnp.asarray(heights - 1.0)[box_indices],
                           jnp.asarray(widths - 1.0)[box_indices],
                           jnp.asarray(widths)[box_indices],
                           jnp.asarray(offsets)[box_indices])
