"""Geometry and image kernels for the TPU-native Mask R-CNN framework.

This package replaces the reference's native extension surface
(c++ext/maskrcnn: nms, crop_forward/crop_backward) with device-agnostic
JAX ops that compile to TPU. Matched signatures, fixed shapes, no
host syncs.
"""

from maskrcnn_tpu.ops.anchors import (config_anchors, generate_level_anchors,
                                      generate_pyramid_anchors)
from maskrcnn_tpu.ops.boxes import (box_area, box_deltas, box_iou,
                                    clip_boxes, decode_boxes, encode_boxes,
                                    refine_boxes, scale_boxes)
from maskrcnn_tpu.ops.image import normalize_image, resize_and_pad
from maskrcnn_tpu.ops.mask_paste import paste_masks
from maskrcnn_tpu.ops.nms import (multiclass_nms_mask, nms_mask,
                                  nms_topk, soft_nms_scores)
from maskrcnn_tpu.ops.roi_align import (crop_and_resize,
                                        multilevel_roi_align, roi_levels)

__all__ = [
    "config_anchors", "generate_level_anchors", "generate_pyramid_anchors",
    "box_area", "box_deltas", "box_iou", "clip_boxes", "decode_boxes",
    "encode_boxes", "refine_boxes", "scale_boxes",
    "normalize_image", "resize_and_pad", "paste_masks",
    "multiclass_nms_mask", "nms_mask", "nms_topk", "soft_nms_scores",
    "crop_and_resize", "multilevel_roi_align", "roi_levels",
]
