"""Standalone COCO evaluation stack: RLE codec, annotation index,
COCOeval, and the evaluation driver (no pycocotools dependency)."""

from maskrcnn_tpu.eval.coco_index import COCO
from maskrcnn_tpu.eval.cocoeval import COCOeval, Params
from maskrcnn_tpu.eval.evaluate import build_coco_results, evaluate_coco

__all__ = ["COCO", "COCOeval", "Params", "build_coco_results",
           "evaluate_coco"]
