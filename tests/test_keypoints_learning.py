"""Trained keypoint-AP gate: the keypoint branch LEARNS, end to end.

Same shape as tests/test_learning_ap.py (the bbox/segm trained gate):
train the Tiny model from scratch on synthetic scenes where the 17
keypoints sit at fixed RELATIVE positions inside each rectangle (a
geometry the head can learn from the rectangle's appearance), then run
the full `evaluate_coco(..., "keypoints")` path — detection pipeline,
keypoint decode, COCO keypoint result serialization, loadRes, OKS
matching, accumulate — on a held-out set and assert OKS AP above a
conservative floor. Exercises every keypoint seam with MODEL-PRODUCED
detections, which the analytic tests (test_keypoints.py) cannot.

Measured on this harness (2026-08-19): 240 steps reach OKS AP50 0.813
(AP@[.5:.95] 0.461, AR50 0.857), kp loss 6.79 -> 4.50 and still
falling; the 0.5 floor leaves margin for RNG/toolchain drift.
~25 min on the CPU test mesh, hence the slow mark.
"""

import json
import os

import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig

STEPS = int(os.environ.get("KP_GATE_STEPS", "240"))

# 17 keypoints on a fixed 4x4 grid + center of each box (fractions of
# box height/width) — learnable landmarks of the rectangle
_FRACS = [(fy, fx) for fy in (0.125, 0.375, 0.625, 0.875)
          for fx in (0.125, 0.375, 0.625, 0.875)] + [(0.5, 0.5)]


def _config():
    return TinyConfig(IMAGE_MIN_DIM=64, IMAGE_MAX_DIM=64,
                      RPN_ANCHOR_SCALES=(4, 8, 16, 32, 64),
                      DETECTION_MIN_CONFIDENCE=0.0,
                      NUM_KEYPOINTS=17, KEYPOINT_HEAD_CONVS=2,
                      KEYPOINT_HEAD_DIM=64)


def _scene(rng, cfg):
    """1-2 solid rectangles; keypoints at the fixed grid fractions."""
    d = cfg.IMAGE_MAX_DIM
    img = np.full((d, d, 3), 30, np.uint8)
    boxes, kps = [], []
    for _ in range(rng.randint(1, 3)):
        y1, x1 = rng.randint(3, int(d * 0.5), 2)
        h, w = rng.randint(int(d * 0.3), int(d * 0.45), 2)
        y2, x2 = min(y1 + h, d - 1), min(x1 + w, d - 1)
        img[y1:y2, x1:x2] = (220, 40, 40)
        boxes.append((y1, x1, y2, x2))
        kp = np.zeros((17, 3), np.float32)
        for j, (fy, fx) in enumerate(_FRACS):
            kp[j] = [y1 + fy * (y2 - y1), x1 + fx * (x2 - x1), 2.0]
        kps.append(kp)
    return img, boxes, kps


def _train_batch(rng, cfg, b):
    d, g = cfg.IMAGE_MAX_DIM, cfg.MAX_GT_INSTANCES
    imgs = np.zeros((b, d, d, 3), np.uint8)
    cls = np.zeros((b, g), np.int32)
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, d, d), np.uint8)
    kps = np.zeros((b, g, 17, 3), np.float32)
    for i in range(b):
        imgs[i], scene_boxes, scene_kps = _scene(rng, cfg)
        for j, (y1, x1, y2, x2) in enumerate(scene_boxes):
            cls[i, j] = 1
            boxes[i, j] = [y1, x1, y2, x2]
            valid[i, j] = True
            masks[i, j, y1:y2, x1:x2] = 1
            kps[i, j] = scene_kps[j]
    return {"images": imgs, "gt_class_ids": cls, "gt_boxes": boxes,
            "gt_masks": masks, "gt_valid": valid, "gt_keypoints": kps}


def _make_coco_dir(tmp_path, cfg, n_images=8):
    """Held-out eval set with keypoint annotations (COCO x, y, v)."""
    from PIL import Image
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2014").mkdir()
    d = cfg.IMAGE_MAX_DIM
    images, anns = [], []
    aid = 1
    for i in range(1, n_images + 1):
        rng = np.random.RandomState(500 + i)   # disjoint from training
        img, scene_boxes, scene_kps = _scene(rng, cfg)
        for (y1, x1, y2, x2), kp in zip(scene_boxes, scene_kps):
            poly = [float(x1), float(y1), float(x2), float(y1),
                    float(x2), float(y2), float(x1), float(y2)]
            flat = [float(t) for (ky, kx, v) in kp for t in (kx, ky, v)]
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [float(x1), float(y1),
                                  float(x2 - x1), float(y2 - y1)],
                         "area": float((x2 - x1) * (y2 - y1)),
                         "iscrowd": 0, "segmentation": [poly],
                         "keypoints": flat, "num_keypoints": 17})
            aid += 1
        name = f"COCO_val2014_{i:012d}.png"
        Image.fromarray(img).save(root / "val2014" / name)
        images.append({"id": i, "height": d, "width": d,
                       "file_name": name})
    with open(root / "annotations" / "instances_minival2014.json",
              "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return str(root)


@pytest.mark.slow
def test_trained_keypoints_reach_oks_ap(tmp_path):
    import jax

    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.data.coco import CocoDataset
    from maskrcnn_tpu.eval.evaluate import evaluate_coco
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)

    cfg = _config()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, 3e-3, decay_mask(params, regex))
    oam = (opt, lambda p, _m=tmask: _m)
    state = TrainState(step=np.int32(0), params=params,
                       opt_state=opt.init(params))
    rng = np.random.RandomState(3)
    key = jax.random.PRNGKey(1)
    for step in range(STEPS):
        key, k = jax.random.split(key)
        state, metrics = train_step(model, oam, state,
                                    _train_batch(rng, cfg, 4), k)
        if step % 60 == 0:
            print(f"step {step}: total={float(metrics['total']):.3f} "
                  f"kp={float(metrics['mrn_kp']):.3f}")
    assert np.isfinite(float(metrics["total"]))

    detector = Detector(cfg, params=jax.device_get(state.params))
    root = _make_coco_dir(tmp_path, cfg)
    ds = CocoDataset(root, "minival", 2014, cfg)
    stats = evaluate_coco(detector, ds, ds.coco, "keypoints", limit=8,
                          batch_size=4)
    # stats[1] = OKS AP@0.5 of the 10-line keypoint report; the floor
    # is conservative vs the measured value (see commit message /
    # BENCHMARKS.md trained-gates section).
    assert stats[1] >= 0.5, f"OKS AP50 {stats[1]:.3f} < 0.5"
