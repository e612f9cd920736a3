"""RetinaNet-FPN variant: one-stage dense detection, no RoIAlign.

TPU-native rebuild of the reference's standalone RetinaFPN backbone
(reference: fpn/retina_fpn.py:45-127 — bias-free convs, P3..P7 with
stride-2 convs for P6/P7 and bilinear top-down), extended into a working
one-stage detector (dense class/box head shared across levels + focal
loss + the same anchors/NMS ops as the two-stage model), per BASELINE
config #3 which uses this variant to exercise the anchor/NMS path alone.
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.common import Conv
from maskrcnn_tpu.models.resnet import FrozenBatchNorm
from maskrcnn_tpu.ops import boxes as box_ops
from maskrcnn_tpu.ops import nms as nms_ops

Dtype = Any


def bilinear_resize_2x(x: jnp.ndarray, out_h: int, out_w: int):
    """F.upsample(..., mode='bilinear') equivalent
    (reference: fpn/retina_fpn.py:102-103 picks bilinear so odd sizes
    line up)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="bilinear")


class RetinaBottleneck(nn.Module):
    """Bias-free bottleneck (reference: fpn/retina_fpn.py:12-42; note it
    differs from the main model's: stride on the 3x3, no SamePad)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype,
                              name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3),
                   strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype,
                              name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.planes * 4, (1, 1), use_bias=False,
                   dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                              name="bn3")(out)
        if (self.stride != 1
                or x.shape[-1] != self.planes * 4):
            residual = Conv(self.planes * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype,
                            name="shortcut_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                       name="shortcut_bn")(residual)
        return nn.relu(out + residual)


class RetinaFPN(nn.Module):
    """P3..P7 pyramid (reference: fpn/retina_fpn.py:45-122)."""

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def stage(x, planes, blocks, stride, name):
            x = RetinaBottleneck(planes, stride, dtype=self.dtype,
                                 name=f"{name}_block0")(x)
            for i in range(1, blocks):
                x = RetinaBottleneck(planes, 1, dtype=self.dtype,
                                     name=f"{name}_block{i}")(x)
            return x

        c1 = Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                  use_bias=False, dtype=self.dtype, name="conv1")(x)
        c1 = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(c1)
        c1 = nn.relu(c1)
        c1 = nn.max_pool(c1, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))

        c2 = stage(c1, 64, self.num_blocks[0], 1, "layer2")
        c3 = stage(c2, 128, self.num_blocks[1], 2, "layer3")
        c4 = stage(c3, 256, self.num_blocks[2], 2, "layer4")
        c5 = stage(c4, 512, self.num_blocks[3], 2, "layer5")

        p6 = Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, name="conv6")(c5)
        p7 = Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, name="conv7")(nn.relu(p6))

        p5 = Conv(256, (1, 1), dtype=self.dtype, name="toplayer")(c5)
        lat4 = Conv(256, (1, 1), dtype=self.dtype, name="latlayer1")(c4)
        p4 = bilinear_resize_2x(p5, lat4.shape[1], lat4.shape[2]) + lat4
        lat3 = Conv(256, (1, 1), dtype=self.dtype, name="latlayer2")(c3)
        p3 = bilinear_resize_2x(p4, lat3.shape[1], lat3.shape[2]) + lat3

        p4 = Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                  name="smooth1")(p4)
        p3 = Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                  name="smooth2")(p3)
        return [p3, p4, p5, p6, p7]


class RetinaHead(nn.Module):
    """Shared dense class+box head (4x conv towers, RetinaNet-style)."""

    num_classes: int
    anchors_per_location: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.anchors_per_location
        cls = x
        box = x
        for i in range(4):
            cls = nn.relu(Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                               dtype=self.dtype, name=f"cls{i}")(cls))
            box = nn.relu(Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                               dtype=self.dtype, name=f"box{i}")(box))
        cls = Conv(a * self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                   bias_init=nn.initializers.constant(-4.595),  # pi=0.01
                   dtype=self.dtype, name="cls_out")(cls)
        box = Conv(a * 4, (3, 3), padding=((1, 1), (1, 1)),
                   dtype=self.dtype, name="box_out")(box)
        b = x.shape[0]
        return (cls.reshape(b, -1, self.num_classes).astype(jnp.float32),
                box.reshape(b, -1, 4).astype(jnp.float32))


class RetinaNet:
    """One-stage detector bundle over RetinaFPN."""

    def __init__(self, config):
        self.config = config
        self.fpn = RetinaFPN(dtype=jnp.dtype(config.COMPUTE_DTYPE))
        self.head = RetinaHead(
            num_classes=config.NUM_CLASSES,
            anchors_per_location=len(config.RPN_ANCHOR_RATIOS),
            dtype=jnp.dtype(config.COMPUTE_DTYPE))

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        d = self.config.IMAGE_MAX_DIM
        dummy = jnp.zeros((1, d, d, 3), jnp.float32)
        fpn_params = self.fpn.init(k1, dummy)
        p3 = jnp.zeros((1, d // 8, d // 8, 256), jnp.float32)
        head_params = self.head.init(k2, p3)
        return {"fpn": fpn_params["params"],
                "head": head_params["params"]}

    def anchors(self):
        """Anchors on strides 8..128 (P3..P7)."""
        import numpy as np

        from maskrcnn_tpu.ops.anchors import generate_pyramid_anchors
        d = self.config.IMAGE_MAX_DIM
        strides = [8, 16, 32, 64, 128]
        shapes = [(d // s, d // s) for s in strides]
        scales = self.config.RPN_ANCHOR_SCALES
        return generate_pyramid_anchors(
            scales, self.config.RPN_ANCHOR_RATIOS, shapes, strides, 1)

    def forward(self, params, images):
        if self.config.QUANT_INT8 and "quant" in params:
            # int8-PTQ inference twin (quant.prepare_retina_quant_params)
            from maskrcnn_tpu import quant
            return quant.retina_quant_forward(
                self.config, params["quant"], params["head"], images,
                self.fpn.num_blocks)
        feats = self.fpn.apply({"params": params["fpn"]}, images)
        outs = [self.head.apply({"params": params["head"]}, f)
                for f in feats]
        logits = jnp.concatenate([o[0] for o in outs], axis=1)
        deltas = jnp.concatenate([o[1] for o in outs], axis=1)
        return logits, deltas

    def losses(self, params, key, images, gt_class_ids, gt_boxes,
               gt_valid):
        """One-stage training loss: focal classification + smooth-L1 box
        regression on RPN-style anchor targets (the standard RetinaNet
        objective; the reference ships only the backbone so this is the
        completion that makes the variant trainable).

        images: [B, H, W, 3] float, already mean-normalized
        (ops.image.normalize_image); gt_boxes pixel coords.
        """
        from maskrcnn_tpu.train.losses import smooth_l1
        from maskrcnn_tpu.train.targets import rpn_targets

        cfg = self.config
        logits, deltas = self.forward(params, images)   # [B, A, K]/[B,A,4]
        anchors = jnp.asarray(self.anchors())
        b = images.shape[0]
        keys = jax.random.split(key, b)

        # reuse the anchor matcher with a generous per-image budget so
        # focal loss sees (nearly) all anchors
        dense_cfg = cfg.replace(
            RPN_TRAIN_ANCHORS_PER_IMAGE=anchors.shape[0])
        tgt = jax.vmap(lambda k, c, bx, v: rpn_targets(
            dense_cfg, k, anchors, c, bx, v))(
                keys, gt_class_ids, gt_boxes, gt_valid)
        match = tgt.rpn_match                            # [B, A]

        # focal classification loss (alpha=0.25, gamma=2), positives get
        # their gt class, negatives background(=0 column unused: one-hot
        # over K with bg column 0)
        k_cls = cfg.NUM_CLASSES
        # per-anchor assigned class: for positives, class of best gt
        from maskrcnn_tpu.ops.boxes import box_iou

        def per_image_cls(bx, c, v):
            iou = jnp.nan_to_num(box_iou(anchors, bx), nan=0.0)
            iou = jnp.where(((c > 0) & v)[None, :], iou, -1.0)
            return c[jnp.argmax(iou, axis=1)]

        assigned = jax.vmap(per_image_cls)(
            gt_boxes, gt_class_ids, gt_valid)            # [B, A]
        onehot = jax.nn.one_hot(
            jnp.where(match == 1, assigned, 0), k_cls)
        p = jax.nn.sigmoid(logits)
        pt = jnp.where(onehot > 0, p, 1.0 - p)
        alpha = jnp.where(onehot > 0, 0.25, 0.75)
        focal = -alpha * (1.0 - pt) ** 2 * jnp.log(
            jnp.clip(pt, 1e-7, 1.0))
        include = (match != 0)[..., None]                # pos+neg anchors
        n_pos = jnp.maximum((match == 1).sum(), 1)
        cls_loss = jnp.sum(focal * include) / n_pos

        # box regression on positives
        from maskrcnn_tpu.ops.boxes import box_deltas as bd
        std = jnp.asarray(cfg.RPN_BBOX_STD_DEV, jnp.float32)

        def per_image_box(bx, c, v, dl):
            iou = jnp.nan_to_num(box_iou(anchors, bx), nan=0.0)
            iou = jnp.where(((c > 0) & v)[None, :], iou, -1.0)
            tgt_box = bx[jnp.argmax(iou, axis=1)]
            t = jnp.nan_to_num(bd(anchors, tgt_box) / std, nan=0.0,
                               posinf=0.0, neginf=0.0)
            return smooth_l1(dl - t)

        box_l1 = jax.vmap(per_image_box)(
            gt_boxes, gt_class_ids, gt_valid, deltas)    # [B, A, 4]
        pos = (match == 1).astype(jnp.float32)[..., None]
        box_loss = jnp.sum(box_l1 * pos) / jnp.maximum(pos.sum() * 4, 1)
        return cls_loss + box_loss, {"cls": cls_loss, "box": box_loss}

    @functools.partial(jax.jit, static_argnums=(0,))
    def detect(self, params, images):
        """Dense decode -> class-aware NMS -> padded detections."""
        cfg = self.config
        d = cfg.IMAGE_MAX_DIM
        logits, deltas = self.forward(params, images)
        anchors = jnp.asarray(self.anchors())
        std = jnp.asarray(cfg.RPN_BBOX_STD_DEV, jnp.float32)

        def per_image(lg, dl):
            probs = jax.nn.sigmoid(lg)[:, 1:]  # drop background column
            best = probs.max(axis=1)
            cls = probs.argmax(axis=1) + 1
            k = min(cfg.PRE_NMS_LIMIT * 2, lg.shape[0])
            scores, order = jax.lax.top_k(best, k)
            boxes = box_ops.refine_boxes(anchors[order], dl[order] * std)
            boxes = box_ops.clip_boxes(boxes, (0.0, 0.0, float(d),
                                               float(d)))
            keep = nms_ops.multiclass_nms_mask(
                boxes, cls[order],
                scores > cfg.DETECTION_MIN_CONFIDENCE,
                cfg.DETECTION_NMS_THRESHOLD, coord_span=float(d))
            n_out = cfg.DETECTION_MAX_INSTANCES
            rank = jnp.where(keep, jnp.arange(k), k + jnp.arange(k))
            take = jnp.argsort(rank)[:n_out]
            valid = keep[take]
            return {
                "boxes": jnp.where(valid[:, None], boxes[take], 0.0),
                "scores": jnp.where(valid, scores[take], 0.0),
                "class_ids": jnp.where(valid, cls[order][take], 0),
                "valid": valid,
            }

        return jax.vmap(per_image)(logits, deltas)
