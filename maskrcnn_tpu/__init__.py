"""maskrcnn_tpu — a TPU-native instance-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
delldu/MaskRCNN reference (PyTorch + C++/CUDA extensions): ResNet-FPN
Mask R-CNN detection/segmentation, COCO training and evaluation, with
every runtime component redesigned for TPU — static shapes, fused
on-device geometry kernels, pjit data parallelism over a device mesh.
"""

__version__ = "0.1.0"

from maskrcnn_tpu.config import (CocoConfig, CocoInferenceConfig, Config,
                                 TinyConfig)

__all__ = ["Config", "CocoConfig", "CocoInferenceConfig", "TinyConfig"]
