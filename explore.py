#!/usr/bin/env python
"""Stage-by-stage pipeline exploration (reference: explore.py).

Composes the public sub-APIs directly — backbone -> rpn_detect ->
rpn_refine -> classify -> mrn_refine — and renders intermediates, keeping
the reference's debugging surface (SURVEY.md section 3.5) callable
stage-by-stage.

    python explore.py [-model weights] [-stage p2|anchors|rpn|detect] image
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from maskrcnn_tpu.api import Detector
from maskrcnn_tpu.config import CocoInferenceConfig
from maskrcnn_tpu.data.codecs import resize_image
from maskrcnn_tpu.detection.pipeline import mrn_refine, rpn_refine
from maskrcnn_tpu.ops.image import normalize_image
from maskrcnn_tpu.ops.roi_align import multilevel_roi_align
from maskrcnn_tpu.utils.visualize import display_instances

parser = argparse.ArgumentParser(description="Mask RCNN Explorer")
parser.add_argument("-model", type=str,
                    default=os.path.join(os.getcwd(),
                                         "models/mask_rcnn_coco.pth"))
parser.add_argument("-stage", type=str, default="detect",
                    choices=["p2", "anchors", "rpn", "detect"])
parser.add_argument("-output", type=str, default="explore_output.png")
parser.add_argument("image", type=str)


def main():
    args = parser.parse_args()
    config = CocoInferenceConfig()
    detector = Detector(config)
    if os.path.exists(args.model):
        detector.load_weights(args.model)
    model, params = detector.model, detector.params

    img = np.asarray(Image.open(args.image).convert("RGB"))
    canvas, window, scale = resize_image(img, config.IMAGE_MIN_DIM,
                                         config.IMAGE_MAX_DIM)
    x = normalize_image(jnp.asarray(canvas[None]), config.MEAN_PIXEL)
    feats = model.backbone(params, x)

    if args.stage == "p2":
        # first 16 channels of P2 as a tiled grayscale grid
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        p2 = np.asarray(feats[0][0])
        fig, axes = plt.subplots(4, 4, figsize=(12, 12))
        for i, ax in enumerate(axes.flat):
            ax.imshow(p2[:, :, i], cmap="viridis")
            ax.axis("off")
        plt.savefig(args.output, bbox_inches="tight")
        print(f"P2 features {p2.shape} -> {args.output}")
        return

    anchors = model.anchors()
    if args.stage == "anchors":
        centers = ((anchors[:, :2] + anchors[:, 2:]) / 2).astype(int)
        print(f"{len(anchors)} anchors; first center {centers[0]}, "
              f"last {centers[-1]}")
        display_instances(canvas, anchors[:3], None,
                          np.zeros(3, int), ["BG"], None,
                          save_path=args.output)
        return

    _, rpn_probs, rpn_bbox = model.rpn_detect(params, feats)
    proposals, valid = rpn_refine(config, jnp.asarray(anchors),
                                  rpn_probs[0], rpn_bbox[0])
    if args.stage == "rpn":
        n = int(np.asarray(valid).sum())
        boxes = np.asarray(proposals)[np.asarray(valid)][:50]
        boxes = boxes * config.IMAGE_MAX_DIM
        print(f"{n} proposals after NMS; showing top 50")
        display_instances(canvas, boxes, None, np.zeros(len(boxes), int),
                          ["BG"], None, save_path=args.output)
        return

    pooled = multilevel_roi_align(
        [f[0] for f in feats[:4]], proposals, config.POOL_SIZE,
        config.IMAGE_SHAPE)
    _, probs, deltas = model.classify(params, pooled)
    det = mrn_refine(config, proposals, valid, probs, deltas,
                     jnp.asarray(window, jnp.float32))
    dvalid = np.asarray(det.valid)
    print(f"{dvalid.sum()} detections")
    display_instances(canvas, np.asarray(det.boxes)[dvalid], None,
                      np.asarray(det.class_ids)[dvalid],
                      [str(i) for i in range(config.NUM_CLASSES)],
                      np.asarray(det.scores)[dvalid],
                      save_path=args.output)


if __name__ == "__main__":
    main()
