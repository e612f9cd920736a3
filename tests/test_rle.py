"""RLE codec tests: roundtrips, golden string, IoU semantics."""

import numpy as np

from maskrcnn_tpu.eval import rle as R

# A real compressed RLE produced by the canonical C implementation
# (captured in the reference's debug comment, coco.py:66-71).
GOLDEN_COUNTS = (b"gP^33U=2O2N2O0O2N2O2M2O3L4L5L2N1O1N2N2O1O0O2N2N100O10"
                 b"0O101N1001O0001O00001OO2O000O2N101O5J5L1N2O1N101N1O2N"
                 b"2N1O3L4L5JcmT4")
GOLDEN_SIZE = [426, 640]


def test_golden_string_roundtrip():
    rle = {"size": GOLDEN_SIZE, "counts": GOLDEN_COUNTS}
    mask = R.decode(rle)
    assert mask.shape == (426, 640)
    assert mask.sum() > 0
    re = R.encode(mask)
    assert re["counts"] == GOLDEN_COUNTS
    assert R.area(rle) == int(mask.sum())
    # bbox consistent with the decoded mask extents
    bb = R.to_bbox(rle)
    ys, xs = np.where(mask)
    np.testing.assert_array_equal(
        bb, [xs.min(), ys.min(), xs.max() - xs.min() + 1,
             ys.max() - ys.min() + 1])


def test_encode_decode_random(rng):
    for _ in range(10):
        m = (rng.rand(37, 23) > 0.6).astype(np.uint8)
        rle = R.encode(m)
        np.testing.assert_array_equal(R.decode(rle), m)
        assert R.area(rle) == m.sum()


def test_encode_all_ones_all_zeros():
    ones = np.ones((5, 4), np.uint8)
    np.testing.assert_array_equal(R.decode(R.encode(ones)), ones)
    zeros = np.zeros((5, 4), np.uint8)
    np.testing.assert_array_equal(R.decode(R.encode(zeros)), zeros)


def test_merge(rng):
    a = (rng.rand(20, 20) > 0.5).astype(np.uint8)
    b = (rng.rand(20, 20) > 0.5).astype(np.uint8)
    union = R.decode(R.merge([R.encode(a), R.encode(b)]))
    np.testing.assert_array_equal(union, a | b)
    inter = R.decode(R.merge([R.encode(a), R.encode(b)], intersect=True))
    np.testing.assert_array_equal(inter, a & b)


def test_mask_iou_matches_dense(rng):
    dts = [(rng.rand(15, 15) > 0.5).astype(np.uint8) for _ in range(3)]
    gts = [(rng.rand(15, 15) > 0.5).astype(np.uint8) for _ in range(2)]
    got = R.iou([R.encode(m) for m in dts], [R.encode(m) for m in gts],
                [0, 0])
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            inter = (d & g).sum()
            union = (d | g).sum()
            np.testing.assert_allclose(got[i, j], inter / union, rtol=1e-6)


def test_crowd_iou_uses_det_area(rng):
    d = np.zeros((10, 10), np.uint8)
    d[2:6, 2:6] = 1  # area 16
    g = np.ones((10, 10), np.uint8)  # crowd covers everything
    got = R.iou([R.encode(d)], [R.encode(g)], [1])
    np.testing.assert_allclose(got[0, 0], 1.0)  # i/area(dt) = 16/16
    got = R.iou([R.encode(d)], [R.encode(g)], [0])
    np.testing.assert_allclose(got[0, 0], 16.0 / 100.0)


def test_bbox_iou_crowd():
    dt = np.array([[0, 0, 4, 4]], np.float64)  # xywh
    gt = np.array([[0, 0, 10, 10]], np.float64)
    np.testing.assert_allclose(R.bb_iou(dt, gt, [1])[0, 0], 1.0)
    np.testing.assert_allclose(R.bb_iou(dt, gt, [0])[0, 0], 16.0 / 100.0)


def test_polygon_rasterization():
    # axis-aligned square: x in [1,4], y in [1,4]
    rle = R.poly_to_rle([1, 1, 1, 4, 4, 4, 4, 1], 6, 6)
    m = R.decode(rle)
    # maskApi semantics: pixels whose centers fall inside; the 3x3 block
    # [1..3] x [1..3]
    expected = np.zeros((6, 6), np.uint8)
    expected[1:4, 1:4] = 1
    np.testing.assert_array_equal(m, expected)


def test_bbox_to_rle():
    rle = R.bbox_to_rle([2, 1, 3, 4], 8, 8)  # x=2, y=1, w=3, h=4
    m = R.decode(rle)
    expected = np.zeros((8, 8), np.uint8)
    expected[1:5, 2:5] = 1
    np.testing.assert_array_equal(m, expected)


def test_uncompressed_rle_conversion():
    m = np.zeros((4, 3), np.uint8)
    m[1:3, 1] = 1
    raw_counts = []
    flat = m.flatten(order="F")
    run = 0
    val = 0
    for v in flat:
        if v == val:
            run += 1
        else:
            raw_counts.append(run)
            run = 1
            val = v
    raw_counts.append(run)
    rle = R.fr_py_objects({"size": [4, 3], "counts": raw_counts}, 4, 3)
    np.testing.assert_array_equal(R.decode(rle), m)
