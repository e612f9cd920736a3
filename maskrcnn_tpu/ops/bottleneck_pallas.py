"""Pallas TPU kernel: fused ResNet identity-bottleneck block.

The C2/C3 stages are HBM-bandwidth bound under XLA: every bottleneck
block materializes its 1x1-reduce, 3x3 and 1x1-expand activations in
HBM (~5 tensor round-trips of the full-resolution map per block,
BENCHMARKS.md backbone decomposition). This kernel keeps the bottleneck
interior entirely in VMEM: per row-tile it reads one [TH+2, W, C]
input window and runs

    h1 = relu(x @ W1 + b1)            # 1x1 reduce   C -> P
    h2 = relu(conv3x3(h1) + b2)       # 9 shifted dots P -> P
    y  = relu(h2 @ W3 + b3 + x)       # 1x1 expand   P -> C, residual

writing only the [TH, W, C] output — HBM traffic drops from ~5x to 2x
the map size (read + write). Weights arrive with the frozen BN already
folded (checkpoint.fold semantics), so the block matches the
reference's conv->BN(frozen)->relu bottleneck exactly
(reference: model.py:174-211).

Inference-only (no vjp). Grid: (B, H/TH). The input stays in HBM
(memory_space ANY) and each step DMAs its halo window manually —
overlapping windows cannot be expressed as a BlockSpec partition. The
input is padded by one zero row top and bottom on the XLA side, so the
window DMA is always in range and the zero rows reproduce the 3x3
conv's SAME padding with no in-kernel masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, xbuf, sem, *, th: int, h: int):
    """One grid step computes TH output rows of one image.

    x_hbm: [B, H+2, W, C] in HBM (zero row top/bottom); out block
    [1, TH, W, C]. Weights in VMEM: w1 [C, P], w2 [9, P, P] (dy*3+dx),
    w3 [P, C], biases [1, P]/[1, C] f32. xbuf: halo window scratch.
    """
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    w = out_ref.shape[2]

    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * th, th + 2)], xbuf, sem)
    cp.start()
    cp.wait()

    f32 = jnp.float32
    xin = xbuf[...]                                  # [TH+2, W, C]

    # 1x1 reduce over the whole halo window: [(TH+2)*W, C] @ [C, P]
    h1 = jax.lax.dot_general(
        xin.reshape((th + 2) * w, -1), w1_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0).astype(xin.dtype)
    p = h1.shape[-1]
    h1 = h1.reshape(th + 2, w, p)
    # the zero halo rows must contribute ZERO to the 3x3 (SAME
    # padding), but the biased 1x1 turned them into relu(b1) — mask
    # rows that lie outside the image
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) \
        + ti * th - 1
    h1 = jnp.where((rows >= 0) & (rows < h), h1,
                   jnp.zeros((), h1.dtype))

    # 3x3 conv as 9 shifted dots accumulated in f32; column SAME
    # padding via a zero-padded copy.
    h1p = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((th * w, p), f32)
    for dy in range(3):
        for dx in range(3):
            win = h1p[dy:dy + th, dx:dx + w, :].reshape(th * w, p)
            acc = acc + jax.lax.dot_general(
                win, w2_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
    h2 = jnp.maximum(acc + b2_ref[...], 0.0).astype(xin.dtype)

    # 1x1 expand + residual + relu
    y = jax.lax.dot_general(
        h2, w3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    res = xin[1:th + 1].reshape(th * w, -1).astype(f32)
    y = jnp.maximum(y + b3_ref[...] + res, 0.0)
    out_ref[0] = y.reshape(th, w, -1).astype(out_ref.dtype)


def fused_identity_bottleneck(x: jnp.ndarray, w1, b1, w2, b2, w3, b3,
                              th: int = 16) -> jnp.ndarray:
    """One identity bottleneck block, BN pre-folded into the weights.

    x: [B, H, W, C]; w1 [1,1,C,P] or [C,P]; w2 [3,3,P,P]; w3 [1,1,P,C].
    Returns relu(x + conv1x1(relu(conv3x3(relu(conv1x1(x)))))).
    """
    b, h, w, c = x.shape
    w1 = w1.reshape(-1, w1.shape[-1])
    w3 = w3.reshape(-1, w3.shape[-1])
    p = w1.shape[-1]
    w2 = w2.reshape(9, p, p)
    assert h % th == 0, (h, th)

    # zero row top and bottom: SAME padding for the 3x3 AND an
    # always-in-range halo DMA (window rows [ti*th, ti*th + th + 2) of
    # the padded map == image rows [ti*th - 1, ti*th + th + 1))
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    grid = (b, h // th)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, h=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c, p), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, p), lambda bi, ti: (0, 0)),
            pl.BlockSpec((9, p, p), lambda bi, ti: (0, 0, 0)),
            pl.BlockSpec((1, p), lambda bi, ti: (0, 0)),
            pl.BlockSpec((p, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w1.astype(x.dtype), b1.reshape(1, p).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, p).astype(jnp.float32),
      w3.astype(x.dtype), b3.reshape(1, c).astype(jnp.float32))
    return out
