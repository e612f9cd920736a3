"""Shared layer aliases with reference-parity weight init.

The reference initialises xavier-uniform conv kernels with zero bias and
N(0, 0.01) linear weights with zero bias (reference: model.py:1021-1035
initialize_weights). flax defaults differ (lecun_normal), so every model
file uses these aliases.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Conv = functools.partial(
    nn.Conv, kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros)


class DeconvK2S2(nn.Module):
    """ConvTranspose(k=2, s=2) as matmul + depth-to-space — exact.

    With kernel == stride the transposed conv has no output overlap:
    out[2y+dy, 2x+dx, o] = sum_i in[y, x, i] * K[dy, dx, o, i], so it is
    ONE per-position linear map [I -> 4*O] followed by a pixel-shuffle
    reshape. Bit-equal to flax ConvTranspose(transpose_kernel=True)
    (verified to 0 ulp in tests/test_models.py) with the SAME param
    names/shapes ([2, 2, O, I] kernel, [O] bias — the torch
    ConvTranspose2d layout the checkpoint converter emits,
    torch_convert.py:11-12).

    Why not nn.ConvTranspose: XLA:CPU lowers the strided
    transposed-conv kernel gradient to a scalar loop (~24 s/step for
    the mask head on the test mesh — it dominated the whole CPU suite),
    and on TPU the einsum form maps straight onto the MXU with no
    conv-rewrite. Forward and backward are plain dots everywhere.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (2, 2, self.features, in_ch))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        y = jnp.einsum("nhwi,aboi->nhawbo", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        n, h, _, w, _, o = y.shape
        return y.reshape(n, 2 * h, 2 * w, o) + bias.astype(self.dtype)

# transpose_kernel=True gives torch ConvTranspose2d semantics exactly
# (kernel [kh, kw, out, in], spatially flipped) — verified bit-exact in
# tests/test_checkpoint.py.
ConvT = functools.partial(
    nn.ConvTranspose, kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros, transpose_kernel=True)

Dense = functools.partial(
    nn.Dense, kernel_init=nn.initializers.normal(stddev=0.01),
    bias_init=nn.initializers.zeros)
