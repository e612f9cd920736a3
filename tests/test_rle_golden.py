"""Golden diff of eval/rle.py against the canonical COCO C (maskApi.c).

The C is compiled from the reference's read-only vendored source into a
test-only .so (tests/rle_c_oracle.py) — the same code every pycocotools
wheel wraps, so bit-exactness here closes the biggest closable AP-parity
risk without COCO assets (VERDICT round 1, item 4). Covers: polygon
rasterisation (>=1000 random polygons), encode/decode, the LEB-ish
string codec, merge, area, toBbox, RLE IoU (incl. crowd), and box IoU.
"""

import numpy as np
import pytest

from maskrcnn_tpu.eval import rle as R
from tests.rle_c_oracle import get_oracle

oracle = get_oracle()
pytestmark = pytest.mark.skipif(
    oracle is None, reason="reference maskApi.c or C compiler unavailable")


def _counts(r):
    return R._rle_counts(r).astype(np.uint32)


def _rand_mask(rng, h, w, p=0.5):
    m = (rng.rand(h, w) < p).astype(np.uint8)
    return m


def test_poly_to_rle_golden_1000():
    """>=1000 random polygons bit-exact vs rleFrPoly (maskApi.c:162-202),
    including the compressed string form."""
    rng = np.random.RandomState(0)
    checked = 0
    for trial in range(1000):
        h = int(rng.randint(1, 64))
        w = int(rng.randint(1, 64))
        k = int(rng.randint(3, 13))
        # mostly in-bounds, sometimes out-of-range coords (negative /
        # beyond the canvas), sometimes integer-aligned
        xy = np.empty(2 * k)
        xy[0::2] = rng.uniform(-3, w + 3, k)
        xy[1::2] = rng.uniform(-3, h + 3, k)
        if trial % 5 == 0:
            xy = np.round(xy)
        ours = _counts(R.poly_to_rle(xy.tolist(), h, w))
        gold = oracle.poly_counts(xy, h, w)
        np.testing.assert_array_equal(ours, gold,
                                      err_msg=f"trial {trial} h={h} w={w}")
        s_ours = R.poly_to_rle(xy.tolist(), h, w)["counts"]
        s_gold = oracle.to_string(gold, h, w)
        assert s_ours == s_gold, f"trial {trial}"
        checked += 1
    assert checked == 1000


def test_encode_golden():
    rng = np.random.RandomState(1)
    for trial in range(200):
        h = int(rng.randint(1, 80))
        w = int(rng.randint(1, 80))
        m = _rand_mask(rng, h, w, p=rng.uniform(0.05, 0.95))
        ours = _counts(R.encode(m))
        gold = oracle.encode_counts(m)
        np.testing.assert_array_equal(ours, gold, err_msg=f"trial {trial}")
        # and the string form
        assert R.encode(m)["counts"] == oracle.to_string(gold, h, w)


def test_decode_golden():
    rng = np.random.RandomState(2)
    for trial in range(200):
        h = int(rng.randint(1, 80))
        w = int(rng.randint(1, 80))
        m = _rand_mask(rng, h, w)
        counts = oracle.encode_counts(m)
        ours = R.decode({"size": [h, w], "counts": counts.tolist()})
        gold = oracle.decode(counts, h, w)
        np.testing.assert_array_equal(ours, gold)
        np.testing.assert_array_equal(ours, m)


def test_string_codec_golden():
    """LEB-ish string codec, both directions, incl. long runs that need
    the delta-vs-two-back encoding and negative-delta sign extension."""
    rng = np.random.RandomState(3)
    for trial in range(300):
        n_runs = int(rng.randint(1, 40))
        counts = rng.randint(0, 1 << int(rng.choice([4, 8, 14, 20])),
                             n_runs).astype(np.uint32)
        h, w = 1, max(1, int(counts.sum()))
        s_gold = oracle.to_string(counts, h, w)
        s_ours = R._counts_to_string(counts)
        assert s_ours == s_gold, f"trial {trial}: {counts}"
        back = R._string_to_counts(s_gold)
        np.testing.assert_array_equal(back.astype(np.uint32), counts)
        back_c = oracle.from_string(s_ours, h, w)
        np.testing.assert_array_equal(back_c, counts)


def test_merge_golden():
    rng = np.random.RandomState(4)
    for trial in range(100):
        h = int(rng.randint(1, 60))
        w = int(rng.randint(1, 60))
        n = int(rng.randint(2, 5))
        masks = [_rand_mask(rng, h, w, p=0.4) for _ in range(n)]
        counts = [oracle.encode_counts(m) for m in masks]
        rles = [{"size": [h, w], "counts": c.tolist()} for c in counts]
        for intersect in (False, True):
            ours = _counts(R.merge(rles, intersect=intersect))
            gold = oracle.merge_counts(counts, h, w, intersect)
            np.testing.assert_array_equal(ours, gold,
                                          err_msg=f"{trial} i={intersect}")


def test_area_tobbox_golden():
    rng = np.random.RandomState(5)
    for trial in range(200):
        h = int(rng.randint(1, 60))
        w = int(rng.randint(1, 60))
        # sparse blob masks give interesting bboxes (empty ones too)
        m = np.zeros((h, w), np.uint8)
        for _ in range(int(rng.randint(0, 3))):
            y0 = rng.randint(0, h)
            x0 = rng.randint(0, w)
            m[y0:y0 + rng.randint(1, h + 1),
              x0:x0 + rng.randint(1, w + 1)] = 1
        counts = oracle.encode_counts(m)
        rle = {"size": [h, w], "counts": counts.tolist()}
        assert R.area(rle) == oracle.area(counts, h, w)
        np.testing.assert_array_equal(R.to_bbox(rle),
                                      oracle.to_bbox(counts, h, w))


def test_rle_iou_golden():
    rng = np.random.RandomState(6)
    for trial in range(60):
        h = int(rng.randint(4, 50))
        w = int(rng.randint(4, 50))
        m = int(rng.randint(1, 5))
        n = int(rng.randint(1, 5))

        def blob():
            msk = np.zeros((h, w), np.uint8)
            y0, x0 = rng.randint(0, h), rng.randint(0, w)
            msk[y0:y0 + rng.randint(1, h), x0:x0 + rng.randint(1, w)] = 1
            return msk

        dts = [oracle.encode_counts(blob()) for _ in range(m)]
        gts = [oracle.encode_counts(blob()) for _ in range(n)]
        crowd = rng.randint(0, 2, n).tolist()
        ours = R.iou([{"size": [h, w], "counts": c.tolist()} for c in dts],
                     [{"size": [h, w], "counts": c.tolist()} for c in gts],
                     crowd)
        gold = oracle.iou(dts, gts, h, w, crowd)
        np.testing.assert_allclose(ours, gold, rtol=0, atol=1e-12,
                                   err_msg=f"trial {trial}")


def test_bb_iou_golden():
    rng = np.random.RandomState(7)
    for trial in range(100):
        m = int(rng.randint(1, 6))
        n = int(rng.randint(1, 6))
        dt = np.abs(rng.randn(m, 4)) * 20
        gt = np.abs(rng.randn(n, 4)) * 20
        crowd = rng.randint(0, 2, n).tolist()
        ours = R.bb_iou(dt, gt, crowd)
        gold = oracle.bb_iou(dt, gt, crowd)
        np.testing.assert_allclose(ours, gold, rtol=0, atol=1e-12)
