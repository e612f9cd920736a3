"""Golden-diff the geometry kernels against the reference's OWN compiled C.

The RLE golden fuzz (tests/test_rle_golden.py) proved this pattern
catches what self-authored numpy oracles miss (it found a real
floor-vs-trunc divergence). Here the same treatment is applied to the
two classic silent-AP-loss kernels (SURVEY section 7 hard parts 1-2):

* ops/nms.py vs nms_cpu.cpp:11-70 — keep sets over 1000+ fuzzed cases,
  including exact IoU == threshold (the >= edge, nms_cpu.cpp:65),
  duplicate boxes, integer-rounded coordinates (the mrn_refine quirk),
  and the class-offset multiclass trick vs a per-class loop over the C
  kernel (reference model.py:1454-1475);
* ops/roi_align.py vs crop_cpu.cpp:13-116 — crops over fuzzed boxes
  including out-of-range extrapolation, degenerate/inverted boxes,
  per-image indexing, FPN level routing composed with per-level C
  crops, both gather paths (row C<64 / patch C>=64), and the backward
  scatter-add vs crop_cpu.cpp:167-265.

Score ties are resolved by the sorter in both implementations (torch
sort in the C path, the caller's argsort here) — an ordering choice,
not kernel semantics — so fuzz scores are made strictly decreasing
after sorting; geometric ties (IoU == threshold, identical boxes) stay.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.ops.nms import multiclass_nms_mask, nms_mask
from maskrcnn_tpu.ops.roi_align import (crop_and_resize,
                                        indexed_crop_and_resize,
                                        multilevel_roi_align, roi_levels)
from tests import geometry_c_oracle as oracle

pytestmark = pytest.mark.skipif(oracle.build() is None,
                                reason="reference C oracle unavailable")


def _sorted_dets(rng, n, span=100.0, integral=False):
    """Random dets [n,5], strictly-decreasing scores (see module doc)."""
    y1 = rng.uniform(0, span * 0.8, n)
    x1 = rng.uniform(0, span * 0.8, n)
    h = rng.uniform(0.0, span * 0.5, n)
    w = rng.uniform(0.0, span * 0.5, n)
    boxes = np.stack([y1, x1, y1 + h, x1 + w], 1).astype(np.float32)
    if integral:
        boxes = np.round(boxes)
    scores = -np.arange(n, dtype=np.float32)  # strictly decreasing
    return np.concatenate([boxes, scores[:, None]], 1)


def _ref_keep_mask(dets, thr):
    keep = oracle.ref_nms(dets, thr)
    mask = np.zeros(len(dets), bool)
    mask[keep] = True
    return mask


@pytest.mark.parametrize("thr", [0.3, 0.5, 0.7])
@pytest.mark.parametrize("integral", [False, True])
def test_nms_fuzz_golden(thr, integral):
    """500 fuzzed cases per (threshold, coordinate-domain) combo."""
    rng = np.random.RandomState(hash((thr, integral)) % (2**31))
    fn = jax.jit(lambda b, v: nms_mask(b, v, thr))
    for case in range(200):
        n = rng.randint(2, 40)
        dets = _sorted_dets(rng, n, integral=integral)
        if case % 5 == 0 and n >= 4:
            dets[1, :4] = dets[0, :4]          # identical box, lower score
            dets[3, :4] = dets[2, :4] + 0.0
        want = _ref_keep_mask(dets, thr)
        got = np.asarray(fn(jnp.asarray(dets[:, :4]),
                            jnp.ones(n, bool)))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"case {case} n={n}")


def test_nms_exact_threshold_edge():
    """IoU exactly == threshold must suppress (>= at nms_cpu.cpp:65).

    [0,0,9,9] vs [0,0,9,19] under the +1 convention: inter=100,
    union=200, IoU=0.5 exactly (all representable)."""
    dets = np.array([[0, 0, 9, 19, 1.0],
                     [0, 0, 9, 9, 0.5]], np.float32)
    want = _ref_keep_mask(dets, 0.5)
    got = np.asarray(nms_mask(jnp.asarray(dets[:, :4]),
                              jnp.ones(2, bool), 0.5))
    np.testing.assert_array_equal(got, want)
    assert not got[1], "exact-threshold overlap must be suppressed"

    # and a hair below the threshold must survive
    dets2 = dets.copy()
    dets2[1, 3] = 9.1   # inter 101x... -> iou just under 0.5? recompute:
    # box1 area 200, box2 (0,0,9,9.1) area 10*10.1=101, inter 10*10.1=101
    # iou = 101/200 > 0.5 -> still suppressed; shrink instead:
    dets2[1] = [0, 0, 9, 8.9, 0.5]  # area 99, inter 99, iou 99/200 < .5
    want2 = _ref_keep_mask(dets2, 0.5)
    got2 = np.asarray(nms_mask(jnp.asarray(dets2[:, :4]),
                               jnp.ones(2, bool), 0.5))
    np.testing.assert_array_equal(got2, want2)
    assert got2[1], "sub-threshold overlap must survive"


def test_nms_chain_suppression_golden():
    """Chained overlaps: B suppressed by A, C overlapping B but not A
    must survive (the classic greedy-vs-matrix distinction)."""
    dets = np.array([[0, 0, 10, 10, 0.9],
                     [0, 6, 10, 16, 0.8],    # IoU with A ~ 0.29
                     [0, 8, 10, 18, 0.7],    # IoU with B high, A low
                     [0, 14, 10, 24, 0.6]], np.float32)
    for thr in (0.2, 0.25, 0.3, 0.5):
        want = _ref_keep_mask(dets, thr)
        got = np.asarray(nms_mask(jnp.asarray(dets[:, :4]),
                                  jnp.ones(4, bool), thr))
        np.testing.assert_array_equal(got, want, err_msg=f"thr={thr}")


def test_multiclass_nms_vs_per_class_c_loop():
    """class-offset trick == the reference's per-class Python loop over
    the C kernel (model.py:1454-1475), 200 fuzzed cases."""
    rng = np.random.RandomState(7)
    span = 128.0
    thr = 0.3
    for case in range(200):
        n = rng.randint(4, 48)
        dets = _sorted_dets(rng, n, span=span * 0.9, integral=True)
        classes = rng.randint(1, 5, n)
        want = np.zeros(n, bool)
        for c in np.unique(classes):
            rows = np.flatnonzero(classes == c)
            keep = oracle.ref_nms(dets[rows], thr)
            want[rows[keep]] = True
        got = np.asarray(multiclass_nms_mask(
            jnp.asarray(dets[:, :4]), jnp.asarray(classes),
            jnp.ones(n, bool), thr, coord_span=span))
        np.testing.assert_array_equal(got, want, err_msg=f"case {case}")


# ---------------------------------------------------------------------
# crop_and_resize


def _rand_boxes(rng, n, lo=-0.3, hi=1.3, inverted_every=7):
    """Normalized fuzz boxes incl. out-of-range and inverted spans."""
    a = rng.uniform(lo, hi, (n, 2)).astype(np.float32)
    b = rng.uniform(lo, hi, (n, 2)).astype(np.float32)
    y1, x1 = np.minimum(a, b).T
    y2, x2 = np.maximum(a, b).T
    boxes = np.stack([y1, x1, y2, x2], 1).astype(np.float32)
    boxes[::inverted_every] = boxes[::inverted_every][:, [2, 3, 0, 1]]
    return boxes


@pytest.mark.parametrize("pool", [7, 14])
def test_crop_single_image_golden(pool, rng):
    """crop_and_resize vs crop_cpu_forward, 12 fuzz rounds x 24 boxes."""
    h, w, c = 25, 31, 3
    fn = jax.jit(lambda i, b: crop_and_resize(i, b, pool))
    for _ in range(12):
        img = rng.randn(h, w, c).astype(np.float32)
        boxes = _rand_boxes(rng, 24)
        got = np.asarray(fn(jnp.asarray(img), jnp.asarray(boxes)))
        want = oracle.ref_crop(img.transpose(2, 0, 1)[None], boxes,
                               np.zeros(len(boxes), np.int32), pool, pool)
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=2e-4)


def test_crop_indexed_golden(rng):
    """indexed_crop_and_resize (per-box image index, the op's full
    reference signature) vs crop_cpu_forward, single channel."""
    g, h, w = 5, 16, 16
    images = rng.rand(g, h, w, 1).astype(np.float32)
    n = 40
    boxes = _rand_boxes(rng, n)
    idx = rng.randint(0, g, n).astype(np.int32)
    got = np.asarray(indexed_crop_and_resize(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(idx), 7))
    want = oracle.ref_crop(images.transpose(0, 3, 1, 2), boxes, idx, 7, 7)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("c", [3, 64])   # row path / patch path
def test_multilevel_roi_align_golden(c, rng):
    """Level routing + per-level crop vs the C kernel run per level.

    The oracle side reproduces the reference's Python level loop
    (model.py:347-376): route each box with roi_levels, crop it from its
    level's feature map with the compiled C, restore order."""
    image_shape = (1024, 1024, 3)
    sizes = [(64, 64), (32, 32), (16, 16), (8, 8)]
    feats = [rng.randn(hh, ww, c).astype(np.float32)
             for hh, ww in sizes]
    n = 64
    boxes = _rand_boxes(rng, n, lo=0.0, hi=1.0, inverted_every=11)
    # log-uniform scales: at 1024^2 the level thresholds sit at
    # sqrt(hw) ~ 0.11/0.22/0.44 normalized, so this spreads traffic
    # over all four levels
    scale = np.exp(rng.uniform(np.log(0.03), 0.0, n)).astype(np.float32)
    boxes[:, 2] = boxes[:, 0] + (boxes[:, 2] - boxes[:, 0]) * scale
    boxes[:, 3] = boxes[:, 1] + (boxes[:, 3] - boxes[:, 1]) * scale

    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(boxes), 7,
        image_shape))

    lvl = np.asarray(roi_levels(jnp.asarray(boxes), image_shape))
    assert len(np.unique(lvl)) >= 3, "fuzz must exercise several levels"
    want = np.zeros_like(got)
    for li, f in enumerate(feats):
        rows = np.flatnonzero(lvl == li)
        if len(rows) == 0:
            continue
        crops = oracle.ref_crop(f.transpose(2, 0, 1)[None], boxes[rows],
                                np.zeros(len(rows), np.int32), 7, 7)
        want[rows] = crops.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_crop_backward_golden(rng):
    """vjp scatter-add vs crop_cpu_backward (crop_cpu.cpp:167-265)."""
    g, h, w, c = 3, 16, 16, 2
    images = rng.rand(g, h, w, c).astype(np.float32)
    n = 24
    boxes = _rand_boxes(rng, n)
    idx = rng.randint(0, g, n).astype(np.int32)

    def f(imgs):
        return indexed_crop_and_resize(imgs, jnp.asarray(boxes),
                                       jnp.asarray(idx), 7)

    cot = rng.randn(n, 7, 7, c).astype(np.float32)
    _, vjp = jax.vjp(f, jnp.asarray(images))
    got = np.asarray(vjp(jnp.asarray(cot))[0])
    want = oracle.ref_crop_backward(cot.transpose(0, 3, 1, 2), boxes,
                                    idx, g, h, w)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=2e-4)


def test_crop_extrapolation_exact_boundary():
    """Sample points exactly on / just past the edge: the C kernel's
    in-range test is `in_y > H-1` (strict), so the corner point H-1 is
    interpolated, H-1+eps extrapolates to 0. Exact-representable boxes
    make both sides deterministic."""
    h, w, c = 9, 9, 1
    img = np.arange(h * w, dtype=np.float32).reshape(h, w, 1)
    boxes = np.array([
        [0.0, 0.0, 1.0, 1.0],       # full image: corners exact
        [0.5, 0.5, 1.0, 1.0],       # ends exactly at the corner
        [0.5, 0.5, 1.25, 1.25],     # overruns: outer cells extrapolate
        [-0.25, -0.25, 0.5, 0.5],   # underruns
        [1.5, 1.5, 2.0, 2.0],       # fully outside
    ], np.float32)
    got = np.asarray(crop_and_resize(jnp.asarray(img),
                                     jnp.asarray(boxes), 7))
    want = oracle.ref_crop(img.transpose(2, 0, 1)[None], boxes,
                           np.zeros(len(boxes), np.int32), 7, 7)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)
    assert (got[4] == 0).all()
