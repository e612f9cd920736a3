"""Region Proposal Network head (reference: model.py:582-649).

One weight-shared head applied to every pyramid level. In NHWC the
reference's permute+reshape dance (model.py:627-641) collapses to a single
reshape: [B, H, W, A*k] -> [B, H*W*A, k], which is exactly the
(y, x, ratio) anchor order the anchor generator emits.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.common import Conv

Dtype = Any


class RPNHead(nn.Module):
    """Shared 3x3 conv -> (2A class logits, 4A box deltas) per location."""

    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.anchors_per_location
        # SamePad2d(3, stride) + Conv 3x3 (model.py:602-603).
        shared = Conv(512, (3, 3),
                         strides=(self.anchor_stride, self.anchor_stride),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="conv_shared")(x)
        shared = nn.relu(shared)

        logits = Conv(2 * a, (1, 1), dtype=self.dtype,
                         name="conv_class")(shared)
        bbox = Conv(4 * a, (1, 1), dtype=self.dtype,
                       name="conv_bbox")(shared)

        b = x.shape[0]
        logits = logits.reshape(b, -1, 2).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        bbox = bbox.reshape(b, -1, 4).astype(jnp.float32)
        return logits, probs, bbox

