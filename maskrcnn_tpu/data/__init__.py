"""Data layer: COCO reader, host codecs, threaded input pipeline."""

from maskrcnn_tpu.data.coco import (COCO_CLASS_IDS, COCO_CLASS_NAMES,
                                    CocoDataset, CocoLabel, coco_annfile,
                                    coco_image_dir)
from maskrcnn_tpu.data.codecs import (decode_boxes, decode_masks,
                                      encode_boxes, encode_masks,
                                      resize_image)
from maskrcnn_tpu.data.augment import Augmenter
from maskrcnn_tpu.data.dataset import (ArrayDataset, DetectionDataset,
                                       mask_extent_box)
from maskrcnn_tpu.data.pipeline import BatchLoader, SyntheticLoader

__all__ = ["COCO_CLASS_IDS", "COCO_CLASS_NAMES", "CocoDataset", "CocoLabel",
           "coco_annfile", "coco_image_dir", "decode_boxes", "decode_masks",
           "encode_boxes", "encode_masks", "resize_image", "BatchLoader",
           "SyntheticLoader", "ArrayDataset", "DetectionDataset",
           "mask_extent_box", "Augmenter"]
