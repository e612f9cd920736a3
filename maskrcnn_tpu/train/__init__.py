"""Training: on-device target samplers, multitask loss, SGD step, trainer."""

from maskrcnn_tpu.train.losses import (Losses, keypoint_loss, mask_loss,
                                       mrn_box_loss,
                                       mrn_class_loss, rpn_box_loss,
                                       rpn_class_loss, smooth_l1)
from maskrcnn_tpu.train.step import (TrainState, compute_losses,
                                     make_optimizer, train_step)
from maskrcnn_tpu.train.targets import (MRNTargets, RPNTargets,
                                        keypoint_targets, mrn_targets,
                                        rpn_targets)
from maskrcnn_tpu.train.trainer import (LAYER_REGEX, Trainer, decay_mask,
                                        trainable_mask)

__all__ = [
    "Losses", "keypoint_loss", "mask_loss", "mrn_box_loss", "mrn_class_loss", "rpn_box_loss",
    "rpn_class_loss", "smooth_l1", "TrainState", "compute_losses",
    "make_optimizer", "train_step", "MRNTargets", "RPNTargets",
    "keypoint_targets", "mrn_targets", "rpn_targets", "LAYER_REGEX", "Trainer", "decay_mask",
    "trainable_mask",
]
