"""Shared layer aliases with reference-parity weight init.

The reference initialises xavier-uniform conv kernels with zero bias and
N(0, 0.01) linear weights with zero bias (reference: model.py:1021-1035
initialize_weights). flax defaults differ (lecun_normal), so every model
file uses these aliases.
"""

from __future__ import annotations

import functools

import flax.linen as nn

Conv = functools.partial(
    nn.Conv, kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros)

# transpose_kernel=True gives torch ConvTranspose2d semantics exactly
# (kernel [kh, kw, out, in], spatially flipped) — verified bit-exact in
# tests/test_checkpoint.py.
ConvT = functools.partial(
    nn.ConvTranspose, kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros, transpose_kernel=True)

Dense = functools.partial(
    nn.Dense, kernel_init=nn.initializers.normal(stddev=0.01),
    bias_init=nn.initializers.zeros)
