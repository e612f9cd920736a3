"""Golden-diff the COCO eval stack against the reference's vendored one.

tests/pycocotools_oracle.py imports the reference's OWN
cocoapi/PythonAPI/pycocotools/{coco,cocoeval}.py (the exact protocol its
published AP numbers used) with the Cython mask module shimmed onto this
framework's RLE backend — which is itself bit-exact vs the reference's
compiled maskApi.c (tests/test_rle_golden.py). Both evaluators therefore
see IDENTICAL IoUs, isolating the seam the analytic AP tests
(tests/test_cocoeval.py) self-author: greedy matching order, crowd
ignore handling, area-range filtering, maxDets truncation, the
precision/recall accumulation and the 12-stat summary.

The synthetic dataset exercises: multiple categories, polygon gts,
uncompressed-RLE crowd gts, small/medium/large areas, missed gts, false
positives, duplicate detections (score ties included), and images with
no gt of a category.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

from maskrcnn_tpu.eval import rle
from maskrcnn_tpu.eval.coco_index import COCO as OurCOCO
from maskrcnn_tpu.eval.cocoeval import COCOeval as OurCOCOeval
from tests.pycocotools_oracle import load


@pytest.fixture(scope="module")
def ref():
    r = load()
    if r is None:
        pytest.skip("reference cocoapi unavailable")
    return r


def _poly_rect(y1, x1, y2, x2, rng):
    """Irregular hexagon roughly filling the box (clockwise, xy pairs)."""
    jit = lambda: rng.uniform(0.0, 0.15)
    xm, ym = (x1 + x2) / 2, (y1 + y2) / 2
    w, h = x2 - x1, y2 - y1
    pts = [(x1 + jit() * w, y1 + jit() * h), (xm, y1),
           (x2 - jit() * w, y1 + jit() * h), (x2, ym),
           (x2 - jit() * w, y2 - jit() * h), (x1 + jit() * w, y2)]
    return [float(v) for p in pts for v in p]


def make_dataset(rng, n_images=8, n_cats=3):
    """(gt dataset dict, bbox results list, segm results list)."""
    images, anns, res = [], [], []
    ann_id = 1
    for i in range(n_images):
        h = int(rng.choice([240, 320, 400]))
        w = int(rng.choice([320, 400, 480]))
        images.append({"id": i + 1, "height": h, "width": w})
        # sizes spanning the area ranges: small < 32^2 <= medium < 96^2
        for size in rng.choice([12, 24, 60, 90, 150, 200],
                               size=rng.randint(2, 6)):
            size = int(size)
            y1 = rng.randint(0, max(h - size, 1))
            x1 = rng.randint(0, max(w - size, 1))
            y2, x2 = min(y1 + size, h - 1), min(x1 + size, w - 1)
            cat = int(rng.randint(1, n_cats + 1))
            if rng.rand() < 0.15:
                # crowd gt as uncompressed RLE of a filled box
                m = np.zeros((h, w), np.uint8)
                m[y1:y2, x1:x2] = 1
                r = rle.encode(m)
                counts = [int(c) for c in rle._rle_counts(r)]
                seg = {"size": [h, w], "counts": counts}
                crowd = 1
            else:
                seg = [_poly_rect(y1, x1, y2, x2, rng)]
                crowd = 0
            anns.append({"id": ann_id, "image_id": i + 1,
                         "category_id": cat, "segmentation": seg,
                         "iscrowd": crowd,
                         "area": float((y2 - y1) * (x2 - x1)),
                         "bbox": [float(x1), float(y1),
                                  float(x2 - x1), float(y2 - y1)]})
            ann_id += 1

            # detections: hit most gts (sometimes twice), jittered
            n_hits = int(rng.choice([0, 1, 1, 1, 2]))
            for _ in range(n_hits):
                dy, dx = rng.randint(-4, 5, 2)
                by1, bx1 = max(y1 + dy, 0), max(x1 + dx, 0)
                by2 = min(by1 + (y2 - y1), h - 1)
                bx2 = min(bx1 + (x2 - x1), w - 1)
                score = float(np.round(rng.uniform(0.2, 0.99), 2))
                res.append({"image_id": i + 1, "category_id": cat,
                            "bbox": [float(bx1), float(by1),
                                     float(bx2 - bx1), float(by2 - by1)],
                            "score": score})
                m = np.zeros((h, w), np.uint8)
                m[by1:by2, bx1:bx2] = 1
                res[-1]["_segm"] = rle.encode(m)
        # false positives
        for _ in range(rng.randint(0, 3)):
            fy, fx = rng.randint(0, h - 30), rng.randint(0, w - 30)
            fs = int(rng.randint(10, 60))
            cat = int(rng.randint(1, n_cats + 1))
            score = float(np.round(rng.uniform(0.2, 0.9), 2))
            res.append({"image_id": i + 1, "category_id": cat,
                        "bbox": [float(fx), float(fy),
                                 float(fs), float(fs)], "score": score})
            m = np.zeros((h, w), np.uint8)
            m[fy:fy + fs, fx:fx + fs] = 1
            res[-1]["_segm"] = rle.encode(m)

    dataset = {"images": images,
               "categories": [{"id": c, "name": f"cat{c}"}
                              for c in range(1, n_cats + 1)],
               "annotations": anns}
    res_bbox = [{k: v for k, v in r.items() if k != "_segm"} for r in res]
    res_segm = [{"image_id": r["image_id"],
                 "category_id": r["category_id"],
                 "segmentation": r["_segm"], "score": r["score"]}
                for r in res]
    return dataset, res_bbox, res_segm


def _run_ref(ref, dataset, results, iou_type):
    gt = ref.COCO()
    gt.dataset = copy.deepcopy(dataset)
    gt.createIndex()
    dt = gt.loadRes(copy.deepcopy(results))
    ev = ref.COCOeval(gt, dt, iou_type)
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev


def _run_ours(dataset, results, iou_type):
    gt = OurCOCO(copy.deepcopy(dataset))
    dt = gt.loadRes(copy.deepcopy(results))
    ev = OurCOCOeval(gt, dt, iou_type)
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev


@pytest.mark.parametrize("iou_type", ["bbox", "segm"])
def test_stats_match_reference(ref, iou_type):
    rng = np.random.RandomState(41)
    dataset, res_bbox, res_segm = make_dataset(rng)
    results = res_bbox if iou_type == "bbox" else res_segm

    ev_ref = _run_ref(ref, dataset, results, iou_type)
    ev_our = _run_ours(dataset, results, iou_type)

    assert np.any(ev_ref.stats > 0), "degenerate scene: no AP signal"
    np.testing.assert_allclose(ev_our.stats, ev_ref.stats,
                               rtol=0, atol=1e-10)
    # full precision/recall tensors, not just the 12 summary numbers
    np.testing.assert_allclose(ev_our.eval["precision"],
                               ev_ref.eval["precision"],
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(ev_our.eval["recall"],
                               ev_ref.eval["recall"],
                               rtol=0, atol=1e-10)


def test_per_image_ious_match_reference(ref):
    """The per-(image,cat) IoU matrices feeding the matcher agree."""
    rng = np.random.RandomState(7)
    dataset, res_bbox, _ = make_dataset(rng, n_images=4)
    ev_ref = _run_ref(ref, dataset, res_bbox, "bbox")
    ev_our = _run_ours(dataset, res_bbox, "bbox")
    keys = [k for k, v in ev_ref.ious.items() if np.size(v)]
    assert keys
    for k in keys:
        np.testing.assert_allclose(ev_our.ious[k], ev_ref.ious[k],
                                   rtol=0, atol=0)
