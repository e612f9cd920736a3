"""GrabCut (GMM + native Dinic graph-cut) tests.

The min-cut itself is validated against exhaustive enumeration on tiny
grids; the full GrabCut loop is checked on a synthetic two-color scene
where the true segmentation is known.
"""

import numpy as np
import pytest

graphcut = pytest.importorskip("tools.grabcut")


def _cut_cost(lab, src, snk, nlink):
    h, w = src.shape
    c = src[~lab].sum() + snk[lab].sum()
    dy = [0, 1, 1, 1]
    dx = [1, 0, 1, -1]
    for y in range(h):
        for x in range(w):
            for k in range(4):
                ny, nx = y + dy[k], x + dx[k]
                if 0 <= ny < h and 0 <= nx < w and \
                        lab[y, x] != lab[ny, nx]:
                    c += nlink[y, x, k]
    return c


def test_mincut_matches_bruteforce():
    rng = np.random.RandomState(0)
    for trial in range(10):
        h, w = int(rng.randint(2, 4)), int(rng.randint(2, 4))
        src = rng.rand(h, w) * 3
        snk = rng.rand(h, w) * 3
        nlink = rng.rand(h, w, 4)
        lab = graphcut.grid_mincut(src, snk, nlink).astype(bool)
        got = _cut_cost(lab, src, snk, nlink)
        n = h * w
        best = np.inf
        for m in range(1 << n):
            cand = np.array([(m >> i) & 1 for i in range(n)],
                            bool).reshape(h, w)
            best = min(best, _cut_cost(cand, src, snk, nlink))
        assert abs(got - best) < 1e-9, (trial, got, best)


def test_grabcut_segments_synthetic_scene():
    rng = np.random.RandomState(1)
    h, w = 120, 90
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = (40, 90, 160) + rng.randint(-8, 8, (h, w, 3))
    gt = np.zeros((h, w), bool)
    gt[30:95, 20:70] = True
    img[gt] = np.asarray((200, 60, 50)) + rng.randint(-8, 8,
                                                      (gt.sum(), 3))

    mask = graphcut.grab_cut(img, rect=(5, 5, w - 5, h - 5), iters=8)
    fg = (mask == graphcut.GC_FGD) | (mask == graphcut.GC_PR_FGD)
    iou = (fg & gt).sum() / (fg | gt).sum()
    assert iou > 0.9, iou


def test_resize_grabcut_surface():
    """The reference demo surface (tools/grabcut.py:19-35): resize +
    border-box prior, returns the masked image."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (64, 48, 3), np.uint8)
    out = graphcut.resize_grabcut(img, seed=12)
    assert out.shape == (graphcut.RESIZE_HEIGHT, graphcut.RESIZE_WIDTH, 3)
