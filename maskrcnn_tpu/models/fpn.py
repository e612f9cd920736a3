"""Feature Pyramid Network neck (reference: model.py:97-168).

NHWC flax rebuild: lateral 1x1 convs on C2..C5, nearest x2 top-down adds
(F.interpolate default mode, model.py:150-152), 3x3 smoothing convs with
SAME padding, and P6 = stride-2 subsample of P5 (MaxPool2d(kernel=1,
stride=2) at model.py:109 picks every other pixel — implemented as a
strided slice, which XLA turns into a zero-cost gather).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from maskrcnn_tpu.models.common import Conv

from maskrcnn_tpu.models.resnet import ResNet

Dtype = Any


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 2H, 2W, C] nearest (F.interpolate default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """Backbone + pyramid neck producing [P2, P3, P4, P5, P6]."""

    architecture: str = "resnet101"
    out_channels: int = 256
    dtype: Dtype = jnp.float32
    remat: bool = False
    fold_bn: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        _, c2, c3, c4, c5 = ResNet(self.architecture, stage5=True,
                                   dtype=self.dtype, remat=self.remat,
                                   fold_bn=self.fold_bn,
                                   s2d_stem=self.s2d_stem,
                                   name="resnet")(x)

        p5 = Conv(oc, (1, 1), dtype=self.dtype, name="P5_conv1")(c5)
        p4 = (Conv(oc, (1, 1), dtype=self.dtype, name="P4_conv1")(c4)
              + nearest_upsample_2x(p5))
        p3 = (Conv(oc, (1, 1), dtype=self.dtype, name="P3_conv1")(c3)
              + nearest_upsample_2x(p4))
        p2 = (Conv(oc, (1, 1), dtype=self.dtype, name="P2_conv1")(c2)
              + nearest_upsample_2x(p3))

        # SamePad2d(3,1)+Conv3x3 smoothing (model.py:111-131) == pad (1,1).
        pad = ((1, 1), (1, 1))
        p5 = Conv(oc, (3, 3), padding=pad, dtype=self.dtype,
                     name="P5_conv2")(p5)
        p4 = Conv(oc, (3, 3), padding=pad, dtype=self.dtype,
                     name="P4_conv2")(p4)
        p3 = Conv(oc, (3, 3), padding=pad, dtype=self.dtype,
                     name="P3_conv2")(p3)
        p2 = Conv(oc, (3, 3), padding=pad, dtype=self.dtype,
                     name="P2_conv2")(p2)

        # P6: MaxPool(kernel=1, stride=2) of P5 (model.py:109, 161).
        p6 = p5[:, ::2, ::2, :]
        return [p2, p3, p4, p5, p6]


def FPN101(dtype=jnp.float32) -> FPN:
    """Standalone educational FPN-101 factory (reference: fpn/fpn.py:125
    exposes FPN101() as a self-contained demo module)."""
    return FPN(architecture="resnet101", dtype=dtype)


def FPN50(dtype=jnp.float32) -> FPN:
    return FPN(architecture="resnet50", dtype=dtype)
