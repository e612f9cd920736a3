"""Model zoo: ResNet-FPN Mask R-CNN and the RetinaFPN variant."""

from maskrcnn_tpu.models.fpn import FPN
from maskrcnn_tpu.models.heads import (BoxHead, KeypointHead,
                                       MaskHead)
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN, param_count
from maskrcnn_tpu.models.resnet import FrozenBatchNorm, ResNet
from maskrcnn_tpu.models.rpn import RPNHead

__all__ = ["FPN", "BoxHead", "KeypointHead", "MaskHead", "MaskRCNN", "param_count",
           "FrozenBatchNorm", "ResNet", "RPNHead"]
