"""COCOeval tests on synthetic datasets with analytically known AP."""

import numpy as np

from maskrcnn_tpu.eval import rle as R
from maskrcnn_tpu.eval.coco_index import COCO
from maskrcnn_tpu.eval.cocoeval import COCOeval


def make_gt(num_images=4, boxes_per_image=2):
    images = []
    anns = []
    aid = 1
    for i in range(1, num_images + 1):
        images.append({"id": i, "height": 100, "width": 100})
        for j in range(boxes_per_image):
            x, y = 10 + 30 * j, 20 + 20 * j
            w, h = 20, 15
            m = np.zeros((100, 100), np.uint8)
            m[y:y + h, x:x + w] = 1
            rle = R.encode(m)
            rle["counts"] = rle["counts"].decode("ascii")
            anns.append({
                "id": aid, "image_id": i, "category_id": 1,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                "segmentation": rle,
            })
            aid += 1
    return COCO({
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "thing"}],
    })


def perfect_results(gt: COCO):
    out = []
    for ann in gt.dataset["annotations"]:
        out.append({
            "image_id": ann["image_id"],
            "category_id": ann["category_id"],
            "bbox": list(ann["bbox"]),
            "score": 0.9,
            "segmentation": dict(ann["segmentation"]),
        })
    return out


def run_eval(gt, results, iou_type):
    dt = gt.loadRes(results)
    e = COCOeval(gt, dt, iou_type)
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e.stats


def test_perfect_detections_ap1():
    gt = make_gt()
    for iou_type in ("bbox", "segm"):
        stats = run_eval(gt, perfect_results(gt), iou_type)
        np.testing.assert_allclose(stats[0], 1.0)   # AP
        np.testing.assert_allclose(stats[8], 1.0)   # AR@100


def test_half_detections_ap_half():
    gt = make_gt(num_images=4, boxes_per_image=2)
    results = [r for i, r in enumerate(perfect_results(gt)) if i % 2 == 0]
    stats = run_eval(gt, results, "bbox")
    # recall caps at 0.5; with 101-pt interpolation AP ~= 0.5 (the
    # first 51 recall bins hold precision 1)
    assert 0.49 <= stats[0] <= 0.52, stats[0]


def test_false_positives_lower_ap():
    gt = make_gt()
    results = perfect_results(gt)
    # add high-scoring junk detections
    for i in range(1, 5):
        results.append({
            "image_id": i, "category_id": 1,
            "bbox": [70.0, 70.0, 10.0, 10.0], "score": 0.95,
        })
    stats = run_eval(gt, results, "bbox")
    assert stats[0] < 1.0


def test_localization_quality_thresholds():
    gt = make_gt(num_images=2, boxes_per_image=1)
    results = perfect_results(gt)
    for r in results:
        r["bbox"] = [r["bbox"][0] + 5, r["bbox"][1], r["bbox"][2],
                     r["bbox"][3]]  # shift -> IoU = 15/25 = 0.6
    stats = run_eval(gt, results, "bbox")
    np.testing.assert_allclose(stats[1], 1.0)  # AP@0.5 still perfect
    assert stats[2] == 0.0                     # AP@0.75 dead
    assert 0.1 < stats[0] < 0.35               # 2 of 10 thresholds pass


def test_crowd_gt_not_counted_but_matchable():
    gt_data = make_gt(num_images=1, boxes_per_image=1)
    d = gt_data.dataset
    m = np.ones((100, 100), np.uint8)
    rle = R.encode(m)
    rle["counts"] = rle["counts"].decode("ascii")
    d["annotations"].append({
        "id": 99, "image_id": 1, "category_id": 1,
        "bbox": [0, 0, 100, 100], "area": 10000, "iscrowd": 1,
        "segmentation": rle,
    })
    gt = COCO(d)
    # detection matching only the crowd: ignored, not a false positive
    results = perfect_results(COCO(make_gt(1, 1).dataset))
    results.append({"image_id": 1, "category_id": 1,
                    "bbox": [60.0, 60.0, 30.0, 30.0], "score": 0.99})
    stats = run_eval(gt, results, "bbox")
    np.testing.assert_allclose(stats[0], 1.0)


def test_area_ranges():
    gt = make_gt()  # all boxes area 300 -> "small" (< 32^2)
    stats = run_eval(gt, perfect_results(gt), "bbox")
    np.testing.assert_allclose(stats[3], 1.0)   # AP small
    assert stats[4] == -1.0                     # AP medium: no gt
    assert stats[5] == -1.0                     # AP large: no gt
