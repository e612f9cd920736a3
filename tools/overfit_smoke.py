#!/usr/bin/env python
"""End-to-end learning smoke: train until the model really detects.

The strongest no-COCO-assets evidence that the whole loop is correct:
overfit the Tiny model on synthetic scenes (red rectangles on a dark
background, one class) and assert that `Detector.detect` then finds the
shapes — RPN, on-device target samplers, 5 losses, SGD, proposal/
detection refinement and mask pasting all have to cooperate for a
single detection to land on a rectangle.

Measured result (2026-08-17, 200 steps, batch 4, lr 3e-3, layer preset
"all"): both objects detected at score ~1.0 with boxes within ~3px of
ground truth and mask IoU > 0.8. ~60s on TPU v5e with a warm compile
cache; ~1h on CPU.

    python tools/overfit_smoke.py [--steps 200] [--lr 3e-3] [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(rng, cfg, b):
    d, g = cfg.IMAGE_MAX_DIM, cfg.MAX_GT_INSTANCES
    imgs = np.full((b, d, d, 3), 30, np.uint8)
    cls = np.zeros((b, g), np.int32)
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, d, d), np.uint8)
    for i in range(b):
        for j in range(rng.randint(1, 3)):
            y1, x1 = rng.randint(5, int(d * 0.55), 2)
            h, w = rng.randint(int(d * 0.23), int(d * 0.4), 2)
            y2, x2 = min(y1 + h, d - 1), min(x1 + w, d - 1)
            imgs[i, y1:y2, x1:x2] = (220, 40, 40)
            cls[i, j] = 1
            boxes[i, j] = [y1, x1, y2, x2]
            valid[i, j] = True
            masks[i, j, y1:y2, x1:x2] = 1
    return {"images": imgs, "gt_class_ids": cls, "gt_boxes": boxes,
            "gt_masks": masks, "gt_valid": valid}


def box_iou(a, b):
    yy1, xx1 = max(a[0], b[0]), max(a[1], b[1])
    yy2, xx2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, yy2 - yy1) * max(0.0, xx2 - xx1)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    return inter / max(area(a) + area(b) - inter, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--cascade", action="store_true",
                    help="train the 3-stage Cascade R-CNN variant "
                         "(CASCADE_STAGES=(0.5, 0.6, 0.7))")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.config import TinyConfig
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)
    from maskrcnn_tpu.utils.profiler import enable_compile_cache

    enable_compile_cache()
    cfg = TinyConfig(DETECTION_MIN_CONFIDENCE=0.0)
    if args.cascade:
        cfg = cfg.replace(CASCADE_STAGES=(0.5, 0.6, 0.7))
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(args.seed)

    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, args.lr, decay_mask(params, regex))
    oam = (opt, lambda p, _m=tmask: _m)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    for step in range(args.steps):
        key, k = jax.random.split(key)
        state, m = train_step(model, oam, state,
                              make_batch(rng, cfg, args.batch), k)
        if step % max(args.steps // 5, 1) == 0:
            print(f"step {step}: total={float(m['total']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"{args.steps} steps in {time.time() - t0:.0f}s")

    det = Detector(cfg, params=state.params)
    hits = misses = 0
    for _ in range(4):
        sample = make_batch(rng, cfg, 1)
        gts = sample["gt_boxes"][0][sample["gt_valid"][0]]
        gt_masks = sample["gt_masks"][0][sample["gt_valid"][0]]
        out = det.detect(sample["images"][0])
        found = [] if out[0] is None else list(
            zip(out[0], out[1], out[2], out[3]))
        for gi, gt in enumerate(gts):
            best = 0.0
            best_miou = 0.0
            for cid, score, box, mask in found:
                iou = box_iou(gt, box)
                if iou > best and score > 0.5 and cid == 1:
                    best = iou
                    m = np.asarray(mask, bool)
                    g = gt_masks[gi].astype(bool)
                    best_miou = (m & g).sum() / max((m | g).sum(), 1)
            if best > 0.5:
                hits += 1
                print(f"  gt {gt.astype(int).tolist()} matched "
                      f"iou={best:.2f} mask_iou={best_miou:.2f}")
            else:
                misses += 1
                print(f"  gt {gt.astype(int).tolist()} MISSED")
    total = hits + misses
    print(f"recall: {hits}/{total}")
    if hits < total * 0.75:
        print("FAIL: the model did not learn to detect")
        sys.exit(1)
    print("PASS: end-to-end training produces real detections")


if __name__ == "__main__":
    main()
