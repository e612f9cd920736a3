"""ResNet-50/101 backbone, TPU-native (flax, NHWC, bfloat16-friendly).

Rebuilt from the reference architecture (reference: model.py:174-270
Bottleneck/ResNet) with TPU idioms:

* NHWC layout (XLA's native conv layout on TPU; the reference is NCHW);
* BatchNorm is *frozen everywhere by construction* — the reference fixes
  all BN params at build time (model.py:1010-1016) and forces BN into eval
  mode even during training (model.py:1218-1223), so BN here is a pure
  affine `x * scale + offset` computed from stored (weight, bias, mean,
  var). XLA fuses it into the preceding convolution;
* explicit padding tuples reproduce the reference's TF-style SamePad2d
  (model.py:64-91) bit-for-bit on the 1024x1024 canvas.

Parameter tree names mirror the reference module tree (C1..C5, conv1/bn1,
downsample) so checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.common import Conv

Dtype = Any

# eps matches nn.BatchNorm2d(..., eps=0.001) (reference: model.py:180).
BN_EPS = 1e-3


class FrozenBatchNorm(nn.Module):
    """Inference-only BatchNorm: y = (x - mean) / sqrt(var + eps) * w + b.

    Stores the four torch buffers/params verbatim (weight, bias,
    running_mean, running_var) so converted checkpoints are 1:1
    verifiable; the scale/offset fold happens at trace time and XLA
    fuses it into the adjacent conv.

    `folded=True` (with params pre-folded into the neighbouring conv by
    checkpoint.fold.fold_bn_params) still declares the four buffers, so
    the param tree stays checkpoint-identical, but applies nothing —
    the affine already lives in the conv kernel/bias.
    """

    features: int
    eps: float = BN_EPS
    dtype: Dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros,
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones,
                         (self.features,))
        if self.folded:
            return x
        scale = weight / jnp.sqrt(var + self.eps)
        offset = bias - mean * scale
        return x * scale.astype(self.dtype) + offset.astype(self.dtype)


class StemConv(nn.Module):
    """The 7x7/2 stem conv, optionally lowered via (2,2) space-to-depth.

    A 7x7 conv over 3 input channels uses 3 of the MXU's 128 input lanes
    at the model's largest spatial extent. The s2d form (MLPerf TPU
    ResNet trick) blocks the image into [H/2, W/2, 12] and applies the
    mathematically identical 4x4/1 conv: the 7x7 kernel is zero-padded
    to 8x8 at the top-left (the pad-(3,3) stride-2 window [2o-3, 2o+3]
    becomes the even-aligned [2o-4, 2o+3]) and re-blocked to
    [4, 4, 12, F] with channel order (dy, dx, c) matching the input
    blocking. Param tree is identical to the plain conv ({kernel, bias},
    kernel [7, 7, 3, F]) so checkpoints are interchangeable.
    """

    features: int = 64
    s2d: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (7, 7, 3, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d:
            y = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        else:
            b, h, w, c = x.shape
            xb = x.reshape(b, h // 2, 2, w // 2, 2, c)
            xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c)
            k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            kb = k8.reshape(4, 2, 4, 2, c, self.features)
            kb = kb.transpose(0, 2, 1, 3, 4, 5).reshape(
                4, 4, 4 * c, self.features)
            y = jax.lax.conv_general_dilated(
                xb, kb, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)
        return y + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1(stride) -> 3x3 -> 1x1(x4) bottleneck (reference: model.py:174-211).

    The reference puts the stride on the 1x1 conv1 (model.py:179), not on
    the 3x3 — preserved (it changes which pixels are sampled).
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                      padding="VALID", dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1",
                              folded=self.fold_bn)(out)
        out = nn.relu(out)
        # SamePad2d(3,1) + Conv 3x3 (model.py:181-182) == pad (1,1).
        out = Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2",
                              folded=self.fold_bn)(out)
        out = nn.relu(out)
        out = Conv(self.planes * 4, (1, 1), padding="VALID",
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                              name="bn3", folded=self.fold_bn)(out)
        if self.has_downsample:
            residual = Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), padding="VALID",
                dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(
                self.planes * 4, dtype=self.dtype,
                name="downsample_bn", folded=self.fold_bn)(residual)
        return nn.relu(out + residual)


class ResNetStage(nn.Module):
    """A stack of bottlenecks (reference: model.py:251-270 make_layer)."""

    planes: int
    blocks: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, self.stride, has_downsample=True,
                       dtype=self.dtype, fold_bn=self.fold_bn,
                       name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype,
                           fold_bn=self.fold_bn, name=f"block{i}")(x)
        return x


class ResNet(nn.Module):
    """ResNet backbone returning (C1out, C2out, C3out, C4out, C5out).

    architecture: "resnet50" (3,4,6,3) or "resnet101" (3,4,23,3)
    (reference: model.py:219).
    """

    architecture: str = "resnet101"
    stage5: bool = True
    dtype: Dtype = jnp.float32
    # rematerialise stage activations in the backward pass: trades ~30%
    # backbone FLOPs for O(stage) activation memory, enabling large
    # per-chip batches at 1024px (jax.checkpoint/nn.remat).
    remat: bool = False
    # frozen BN pre-folded into conv kernels (inference-only; pair with
    # checkpoint.fold.fold_bn_params) and space-to-depth stem.
    fold_bn: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        assert self.architecture in ("resnet50", "resnet101")
        layers = {"resnet50": 6, "resnet101": 23}[self.architecture]
        Stage = nn.remat(ResNetStage) if self.remat else ResNetStage

        # C1 (reference: model.py:223-229): 7x7/2 pad 3, BN, relu,
        # SamePad(3,2) -> pad (0,1) on the 512 grid, maxpool 3x3/2.
        x = StemConv(64, s2d=self.s2d_stem, dtype=self.dtype,
                     name="C1_conv")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="C1_bn",
                            folded=self.fold_bn)(x)
        x = nn.relu(x)
        c1 = nn.max_pool(x, (3, 3), strides=(2, 2),
                         padding=((0, 1), (0, 1)))

        c2 = Stage(64, 3, stride=1, dtype=self.dtype,
                   fold_bn=self.fold_bn, name="C2")(c1)
        c3 = Stage(128, 4, stride=2, dtype=self.dtype,
                   fold_bn=self.fold_bn, name="C3")(c2)
        c4 = Stage(256, layers, stride=2, dtype=self.dtype,
                   fold_bn=self.fold_bn, name="C4")(c3)
        if self.stage5:
            c5 = Stage(512, 3, stride=2, dtype=self.dtype,
                       fold_bn=self.fold_bn, name="C5")(c4)
        else:
            c5 = None
        return c1, c2, c3, c4, c5
