#!/usr/bin/env python
"""Single-image Mask R-CNN inference CLI.

Same argv surface as the reference (reference: predict.py:31-37):

    python predict.py [-model /path/to/weights] <image>

Accepts either a converted orbax checkpoint dir or the original torch
`mask_rcnn_coco.pth` (converted on the fly).
"""

import argparse
import os

import numpy as np
from PIL import Image

from maskrcnn_tpu.api import Detector
from maskrcnn_tpu.config import CocoInferenceConfig
from maskrcnn_tpu.utils.profiler import enable_compile_cache

enable_compile_cache()
from maskrcnn_tpu.data.coco import COCO_CLASS_NAMES, CocoLabel
from maskrcnn_tpu.utils.visualize import display_instances

ROOT_DIR = os.getcwd()
COCO_MODEL_PATH = os.path.join(ROOT_DIR, "models/mask_rcnn_coco.pth")

parser = argparse.ArgumentParser(
    description="Mask RCNN Predictor",
    epilog="Protocol presets (throughput / box-quality / mask-quality / balanced) with measured AP+img/s: see README.md \"Choosing an inference protocol\".")
parser.add_argument("-model", type=str, default=COCO_MODEL_PATH,
                    help=f"trained model [{COCO_MODEL_PATH}]")
parser.add_argument("-output", type=str, default=None,
                    help="save the rendered overlay to this path")
parser.add_argument("-tta", action="store_true",
                    help="horizontal-flip test-time augmentation "
                    "(two box passes, NMS-merged; config.TTA_HFLIP)")
parser.add_argument("-soft-nms", type=float, default=0.0, metavar="S",
                    help="gaussian Soft-NMS sigma instead of hard "
                    "detection NMS (0 = off). Decayed survivors are "
                    "dropped below DETECTION_MIN_CONFIDENCE — this CLI "
                    "uses the eval config (0.0) so they are retained; "
                    "with the base serving config (0.7) lower the "
                    "confidence floor to see soft-NMS retention")
parser.add_argument("-cascade", type=str, default=None, metavar="IOUS",
                    help="Cascade R-CNN stage IoUs, e.g. '0.5,0.6,0.7' "
                    "(config.CASCADE_STAGES); must match the "
                    "checkpoint's stage structure")
parser.add_argument("image", type=str, help="image file")

if __name__ == "__main__":
    args = parser.parse_args()
    cascade = (tuple(float(x) for x in args.cascade.split(","))
               if args.cascade else ())
    config = CocoInferenceConfig(
        TTA_HFLIP=args.tta, DETECTION_SOFT_NMS_SIGMA=args.soft_nms,
        CASCADE_STAGES=cascade)

    detector = Detector(config)
    if os.path.exists(args.model):
        detector.load_weights(args.model)
    else:
        print("Weight file not found ...")

    img = np.asarray(Image.open(args.image).convert("RGB"))
    class_ids, scores, boxes, masks = detector.detect(img)

    if class_ids is not None:
        for i, j in enumerate(class_ids):
            print(j, CocoLabel.zh_name(j), boxes[i], scores[i])
        display_instances(
            img, np.array(boxes), np.array(masks), np.array(class_ids),
            COCO_CLASS_NAMES, np.array(scores),
            save_path=args.output or "predict_output.png")
    else:
        print("nothing detected")
