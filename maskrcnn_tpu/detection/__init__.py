"""Jitted detection pipelines (proposal layer, refinement, full predict)."""

from maskrcnn_tpu.detection.pipeline import (Detections,
                                             decode_keypoints,
                                             mrn_refine, predict_step,
                                             rpn_refine,
                                             rpn_refine_scores)

__all__ = ["Detections", "decode_keypoints", "mrn_refine", "predict_step", "rpn_refine",
           "rpn_refine_scores"]
