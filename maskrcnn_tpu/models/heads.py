"""Box classifier head and mask head (reference: model.py:724-920).

Both heads take already-pooled RoI features — RoIAlign is parameter-free
geometry and lives in ops/roi_align.py, applied by the detection/training
pipelines. That separation lets the pipelines vmap heads over images and
keep the pooled batch as one big [N, P, P, C] MXU-friendly tensor.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.common import Conv, DeconvK2S2, Dense

from maskrcnn_tpu.models.resnet import FrozenBatchNorm

Dtype = Any


class BoxHead(nn.Module):
    """Classifier head (reference: model.py:724-800 `Classifier`).

    pooled: [N, 7, 7, 256] -> (class_logits [N, K], probs [N, K],
    bbox deltas [N, K, 4]).
    """

    num_classes: int
    pool_size: int = 7
    dtype: Dtype = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, pooled):
        n = pooled.shape[0]
        x = pooled.astype(self.dtype)
        # conv k=pool_size VALID == per-RoI dense over the whole window
        # (reference: model.py:731) -> [N, 1, 1, 1024].
        x = Conv(1024, (self.pool_size, self.pool_size), padding="VALID",
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(1024, dtype=self.dtype, name="bn1",
                            folded=self.fold_bn)(x)
        x = nn.relu(x)
        x = Conv(1024, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv2")(x)
        x = FrozenBatchNorm(1024, dtype=self.dtype, name="bn2",
                            folded=self.fold_bn)(x)
        x = nn.relu(x)
        x = x.reshape(n, 1024)

        logits = Dense(self.num_classes, dtype=self.dtype,
                          name="linear_class")(x).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        bbox = Dense(self.num_classes * 4, dtype=self.dtype,
                        name="linear_bbox")(x).astype(jnp.float32)
        return logits, probs, bbox.reshape(n, self.num_classes, 4)


class KeypointHead(nn.Module):
    """Keypoint head (Mask R-CNN paper, "Human Pose Estimation";
    Detectron `keypoint_rcnn_heads`: 8 x conv512 -> deconv x2 ->
    bilinear x2). No reference equivalent — delldu/MaskRCNN stops at
    boxes+masks; this head completes the paper's task set.

    pooled: [N, P, P, 256] -> per-keypoint heatmap LOGITS
    [N, 4P, 4P, K] float32 (deconv doubles, bilinear doubles again).
    Softmax over the 4P*4P positions happens in the loss / decode —
    one heatmap is one K-way spatial classification, which is what
    makes keypoints sub-pixel-sharp vs regressing coordinates.

    TPU notes: the conv stack is [N*P*P, dim] matmuls on the MXU (same
    shape class as the mask head, 2x channels); the deconv is the
    matmul+depth-to-space form (common.DeconvK2S2 — no strided-conv
    gradient scalar loop on CPU, plain dots on TPU); the final fixed 2x
    bilinear is a 4-tap elementwise blend XLA fuses into the epilogue.
    """

    num_keypoints: int
    convs: int = 8
    dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled.astype(self.dtype)
        pad = ((1, 1), (1, 1))
        for i in range(1, self.convs + 1):
            x = Conv(self.dim, (3, 3), padding=pad, dtype=self.dtype,
                     name=f"conv{i}")(x)
            x = nn.relu(x)
        x = DeconvK2S2(self.dim, dtype=self.dtype, name="deconv")(x)
        x = nn.relu(x)
        logits = Conv(self.num_keypoints, (1, 1), dtype=self.dtype,
                      name="score")(x).astype(jnp.float32)
        # fixed 2x bilinear upsample (half-pixel centers), logits space
        n, h, w, k = logits.shape
        return jax.image.resize(logits, (n, 2 * h, 2 * w, k),
                                method="bilinear")


class MaskHead(nn.Module):
    """Mask head (reference: model.py:848-920 `Mask`).

    pooled: [N, 14, 14, 256] -> per-class sigmoid masks [N, 28, 28, K].
    """

    num_classes: int
    dtype: Dtype = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, pooled):
        x = pooled.astype(self.dtype)
        pad = ((1, 1), (1, 1))
        for i in range(1, 5):
            x = Conv(256, (3, 3), padding=pad, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = FrozenBatchNorm(256, dtype=self.dtype, name=f"bn{i}",
                                folded=self.fold_bn)(x)
            x = nn.relu(x)
        # Deconv 2x2 stride 2 (model.py:864): 14 -> 28, as matmul +
        # depth-to-space (exact; see common.DeconvK2S2).
        x = DeconvK2S2(256, dtype=self.dtype, name="deconv")(x)
        x = nn.relu(x)
        x = Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="conv5")(x).astype(jnp.float32)
        return jax.nn.sigmoid(x)
