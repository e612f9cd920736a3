"""RoIAlign tests against a numpy oracle of the reference crop kernel.

Oracle reproduces crop_cpu.cpp:13-116 (tf.crop_and_resize semantics:
(size-1) scaling, single bilinear sample per cell, extrapolation 0) and
the level-routing equation of model.py:335-338.
"""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops import roi_align as R


def np_crop(image_chw, boxes, crop_h, crop_w, extrapolation=0.0):
    """Oracle of crop_per_box (crop_cpu.cpp:13-116). image: [C, H, W]."""
    c, ih, iw = image_chw.shape
    n = len(boxes)
    out = np.zeros((n, c, crop_h, crop_w), np.float32)
    for b in range(n):
        y1, x1, y2, x2 = boxes[b]
        hs = (y2 - y1) * (ih - 1) / (crop_h - 1)
        ws = (x2 - x1) * (iw - 1) / (crop_w - 1)
        for y in range(crop_h):
            in_y = y1 * (ih - 1) + y * hs
            if in_y < 0 or in_y > ih - 1:
                out[b, :, y, :] = extrapolation
                continue
            ty = int(np.floor(in_y))
            by = int(np.ceil(in_y))
            yl = in_y - ty
            for x in range(crop_w):
                in_x = x1 * (iw - 1) + x * ws
                if in_x < 0 or in_x > iw - 1:
                    out[b, :, y, x] = extrapolation
                    continue
                lx = int(np.floor(in_x))
                rx = int(np.ceil(in_x))
                xl = in_x - lx
                top = image_chw[:, ty, lx] + (
                    image_chw[:, ty, rx] - image_chw[:, ty, lx]) * xl
                bot = image_chw[:, by, lx] + (
                    image_chw[:, by, rx] - image_chw[:, by, lx]) * xl
                out[b, :, y, x] = top + (bot - top) * yl
    return out


def test_single_level_crop_matches_oracle(rng):
    image = rng.rand(16, 16, 3).astype(np.float32)
    boxes = np.array([
        [0.0, 0.0, 1.0, 1.0],
        [0.25, 0.25, 0.75, 0.75],
        [0.1, 0.2, 0.9, 0.5],
        [-0.2, -0.2, 0.5, 0.5],   # partially outside -> extrapolation 0
        [0.0, 0.0, 0.0, 0.0],     # degenerate zero box
    ], np.float32)
    got = np.asarray(R.crop_and_resize(jnp.asarray(image), jnp.asarray(boxes), 7))
    want = np_crop(image.transpose(2, 0, 1), boxes, 7, 7)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_roi_level_routing():
    """Level equation of model.py:335-338 at 1024x1024."""
    image_shape = (1024, 1024)
    # 224px box (normalized 224/1024) -> P4 -> index 2
    s = 224.0 / 1024.0
    boxes = jnp.asarray([
        [0.0, 0.0, s, s],              # -> level 4 (idx 2)
        [0.0, 0.0, s / 2, s / 2],      # 112px -> level 3 (idx 1)
        [0.0, 0.0, s * 2, s * 2],      # 448px -> level 5 (idx 3)
        [0.0, 0.0, s / 8, s / 8],      # 28px -> level 2 clamped (idx 0)
        [0.0, 0.0, 1.0, 1.0],          # 1024px -> level 5 clamped (idx 3)
        [0.0, 0.0, 0.0, 0.0],          # zero box -> -inf -> clamp to 2
    ])
    lvl = np.asarray(R.roi_levels(boxes, image_shape))
    np.testing.assert_array_equal(lvl, [2, 1, 3, 0, 3, 0])


def test_multilevel_routing_selects_right_features(rng):
    """Fill each level with a constant; pooled value identifies the level."""
    shapes = [(64, 64), (32, 32), (16, 16), (8, 8)]
    feats = [jnp.full(s + (1,), float(i + 1)) for i, s in enumerate(shapes)]
    image_shape = (256, 256)
    boxes = jnp.asarray([
        [0.1, 0.1, 0.1 + 56.0 / 256, 0.1 + 56.0 / 256],    # small -> P2
        [0.1, 0.1, 0.1 + 224.0 / 256, 0.1 + 224.0 / 256],  # 224px -> P4
    ])
    out = np.asarray(R.multilevel_roi_align(feats, boxes, 7, image_shape))
    lvl = np.asarray(R.roi_levels(boxes, image_shape))
    for i in range(2):
        np.testing.assert_allclose(out[i], lvl[i] + 1.0, rtol=1e-6)


def test_gradient_flows_to_features_not_boxes(rng):
    image = jnp.asarray(rng.rand(8, 8, 2).astype(np.float32))
    boxes = jnp.asarray([[0.2, 0.2, 0.8, 0.8]])

    def loss_img(img):
        return R.crop_and_resize(img, boxes, 5).sum()

    g = jax.grad(loss_img)(image)
    assert np.abs(np.asarray(g)).sum() > 0

    def loss_box(b):
        return R.crop_and_resize(image, b, 5).sum()

    gb = jax.grad(loss_box)(boxes)
    np.testing.assert_allclose(np.asarray(gb), 0.0)


def test_crop_backward_matches_oracle_numerics(rng):
    """Finite-difference check of the autodiff backward (replaces the
    hand-written crop_cpu_backward at crop_cpu.cpp:167-265)."""
    image = rng.rand(6, 6, 1).astype(np.float32)
    boxes = jnp.asarray([[0.1, 0.1, 0.9, 0.7]])
    w = rng.rand(1, 4, 4, 1).astype(np.float32)

    def f(img):
        return (R.crop_and_resize(img, boxes, 4) * w).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(image)))
    eps = 1e-3
    for idx in [(0, 0, 0), (2, 3, 0), (5, 5, 0)]:
        ip = image.copy()
        ip[idx] += eps
        im = image.copy()
        im[idx] -= eps
        fd = (f(jnp.asarray(ip)) - f(jnp.asarray(im))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-2, atol=1e-3)


def test_sample_points_strict_f32():
    """sample_points must round ONCE per op in f32, exactly like the
    reference C kernel compiled without FMA (crop_cpu.cpp:52-61): the
    in-range/extrapolation decision at image-boundary boxes (y2 == 1.0
    -> in_y == H-1 only under strict per-op rounding) depends on the
    last ulp. Guards against two compiler rewrites: constant-divisor ->
    reciprocal multiply, and mul+add -> FMA inside the consumer fusion
    (which survives optimization_barrier via producer duplication)."""
    rng = np.random.RandomState(0)
    n = 50000
    pool = 7
    y1 = rng.rand(n).astype(np.float32)
    y2 = np.maximum(
        y1, np.where(rng.rand(n) < 0.5, np.float32(1.0),
                     rng.rand(n).astype(np.float32)))
    x1 = rng.rand(n).astype(np.float32)
    x2 = np.maximum(
        x1, np.where(rng.rand(n) < 0.5, np.float32(1.0),
                     rng.rand(n).astype(np.float32)))
    boxes = np.stack([y1, x1, y2, x2], 1)
    hm = np.full((n,), 63.0, np.float32)
    wm = np.full((n,), 31.0, np.float32)

    def strict(a1, a2, m):
        d = (a2 - a1).astype(np.float32)
        scale = ((d * m).astype(np.float32)
                 / np.float32(pool - 1)).astype(np.float32)
        base = (a1 * m).astype(np.float32)
        steps = np.arange(pool, dtype=np.float32)
        off = (steps[None, :] * scale[:, None]).astype(np.float32)
        return (base[:, None] + off).astype(np.float32)

    want_y = strict(y1, y2, hm)
    want_x = strict(x1, x2, wm)

    # inside a consumer fusion shaped like _crop_core (the flag compare
    # and lerp pull the sample points into a bigger fused computation,
    # which is where the FMA contraction used to fire)
    def fused(b):
        iy, ix = R.sample_points(b, jnp.asarray(hm), jnp.asarray(wm),
                                 pool)
        oy = (iy < 0.0) | (iy > jnp.asarray(hm)[:, None])
        t = jnp.clip(iy, 0.0, 63.0) - jnp.floor(iy)
        return iy, ix, oy, t

    iy, ix, oy, _ = jax.jit(fused)(jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(iy), want_y)
    np.testing.assert_array_equal(np.asarray(ix), want_x)
    np.testing.assert_array_equal(np.asarray(oy), want_y > 63.0)
