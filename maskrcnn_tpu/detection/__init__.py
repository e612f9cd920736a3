"""Jitted detection pipelines (proposal layer, refinement, full predict)."""

from maskrcnn_tpu.detection.pipeline import (Detections,
                                             decode_keypoints,
                                             detect_and_pool_masks,
                                             detect_and_pool_masks_tta,
                                             detect_boxes,
                                             flip_boxes, flip_windows,
                                             merge_detections,
                                             mrn_refine, predict_step,
                                             rpn_refine,
                                             rpn_refine_scores)

__all__ = ["Detections", "decode_keypoints", "detect_and_pool_masks",
           "detect_and_pool_masks_tta", "detect_boxes", "flip_boxes",
           "flip_windows", "merge_detections", "mrn_refine",
           "predict_step", "rpn_refine", "rpn_refine_scores"]
