#!/usr/bin/env python
"""Train the Tiny keypoint model on synthetic scenes and render its
detections + keypoints to output/keypoints.jpg.

Reuses the trained-gate machinery (tests/test_keypoints_learning.py):
rectangles whose 17 keypoints sit at fixed relative positions. The
render shows model-produced boxes, masks AND heatmap-decoded keypoint
dots on a held-out scene — the visual counterpart of the OKS AP gate.

    python tools/keypoint_demo.py [--steps 240] [--out output/keypoints.jpg]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--out", default="output/keypoints.jpg")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tests.test_keypoints_learning import _config, _scene, _train_batch

    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)
    from maskrcnn_tpu.utils.visualize import display_instances

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
    for step in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = train_step(model, oam, state,
                                    _train_batch(rng, cfg, 4), k)
        if step % 40 == 0:
            print(f"step {step}: total={float(metrics['total']):.3f} "
                  f"kp={float(metrics['mrn_kp']):.3f}")

    det = Detector(cfg, params=jax.device_get(state.params))
    img, gt_boxes, gt_kps = _scene(np.random.RandomState(777), cfg)
    out = det.detect(img)
    if out[0] is None:
        print("no detections — train longer (--steps)")
        return 1
    class_ids, scores, boxes, masks, kp = out
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    display_instances(img, np.asarray(boxes), np.asarray(masks),
                      class_ids, ["BG", "object"], scores,
                      title=f"keypoint branch after {args.steps} steps "
                            f"({len(class_ids)} det / {len(gt_boxes)} gt)",
                      save_path=args.out, keypoints=kp)
    # quick numeric summary: mean decoded-vs-gt keypoint error on the
    # best-matched detection per gt
    errs = []
    for gb, gk in zip(gt_boxes, gt_kps):
        ious = []
        gb = np.asarray(gb, np.float64)
        for b in np.asarray(boxes, np.float64):
            yy = max(0, min(gb[2], b[2]) - max(gb[0], b[0]))
            xx = max(0, min(gb[3], b[3]) - max(gb[1], b[1]))
            inter = yy * xx
            union = ((gb[2] - gb[0]) * (gb[3] - gb[1])
                     + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            ious.append(inter / union if union else 0.0)
        i = int(np.argmax(ious))
        if ious[i] < 0.5:
            continue
        errs.append(np.hypot(kp[i][:, 0] - gk[:, 0],
                             kp[i][:, 1] - gk[:, 1]).mean())
    if errs:
        print(f"mean keypoint error on matched detections: "
              f"{np.mean(errs):.2f} px (canvas {cfg.IMAGE_MAX_DIM})")
    print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
