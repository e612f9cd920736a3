"""Pallas TPU kernel for greedy NMS.

Optimized v2 of ops/nms.py's lax.fori_loop NMS (SURVEY.md section 7 step
2). The baseline's sequential chain is N loop steps of N-wide VPU work;
this kernel processes boxes in 64-row blocks like the reference's CUDA
bitmask kernel (reference: c++ext/maskrcnn/csrc/cuda/nms_cuda.cu:29-74)
— but where the CUDA version copies its bitmask to the HOST for the
final scan (nms_cuda.cu:107-131, a device sync per call), everything
here stays in VMEM.

Mosaic constraints shape the code: TPU Pallas cannot dynamic-slice
values and requires aligned dynamic ref slices, but the block count is
a compile-time constant — so the whole diagonal walk is a *statically
unrolled* loop over blocks (static slices everywhere), with the
sequential dependency only in the 64 scalar steps of each diagonal
block's resolution.

Semantics identical to ops/nms.nms_mask: boxes pre-sorted by descending
score, +1 pixel-area convention, suppression at iou >= threshold,
invalid rows neither survive nor suppress.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 64


def _nms_kernel(boxes_ref, invalid_ref, thr_ref, keep_ref):
    """Single-program kernel: boxes [N, 4] f32 in VMEM -> keep [1, N] i32.

    Vector state is carried as [1, N] 2-D so the kernel stays legal
    under vmap (mosaic block rules want >=2-D trailing shapes).
    """
    n = boxes_ref.shape[0]
    nblk = n // BLOCK

    thr = thr_ref[0]
    y1 = boxes_ref[:, 0]
    x1 = boxes_ref[:, 1]
    y2 = boxes_ref[:, 2]
    x2 = boxes_ref[:, 3]
    area = (y2 - y1 + 1.0) * (x2 - x1 + 1.0)

    supp = invalid_ref[0, :]  # int32 0/1, [N]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)

    for bi in range(nblk):  # static unroll: all slices compile-time
        lo, hi = bi * BLOCK, (bi + 1) * BLOCK
        ry1, rx1 = y1[lo:hi], x1[lo:hi]
        ry2, rx2 = y2[lo:hi], x2[lo:hi]
        rarea = area[lo:hi]

        # block rows vs ALL columns: [BLOCK, N]
        cy1 = jnp.maximum(ry1[:, None], y1[None, :])
        cx1 = jnp.maximum(rx1[:, None], x1[None, :])
        cy2 = jnp.minimum(ry2[:, None], y2[None, :])
        cx2 = jnp.minimum(rx2[:, None], x2[None, :])
        ch = jnp.maximum(cy2 - cy1 + 1.0, 0.0)
        cw = jnp.maximum(cx2 - cx1 + 1.0, 0.0)
        cinter = ch * cw
        ciou = cinter / (rarea[:, None] + area[None, :] - cinter)
        smat = (ciou >= thr).astype(jnp.int32)     # [BLOCK, N]

        # strictly-later columns only (greedy order)
        col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, n), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, n), 0)
        smat = smat * (col > (row + lo)).astype(jnp.int32)

        # greedy row-by-row over the block, full-width updates; the
        # row's alive bit comes from a one-hot reduction (mosaic has no
        # value extraction / scatter / unaligned slices)
        for i in range(BLOCK):
            g = lo + i
            alive = 1 - jnp.max(supp * (idx == g).astype(jnp.int32))
            supp = jnp.maximum(supp, smat[i] * alive)

    keep_ref[0, :] = (1 - supp) * (1 - invalid_ref[0, :])


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_mask_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float) -> jnp.ndarray:
    """Drop-in replacement for ops.nms.nms_mask on TPU.

    boxes: [N, 4] score-descending; N is padded to a BLOCK multiple
    internally. Returns keep [N] bool.
    """
    n = boxes.shape[0]
    pad = (-n) % BLOCK
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    npad = boxes.shape[0]
    thr = jnp.full((1,), iou_threshold, jnp.float32)
    invalid = jnp.logical_not(valid).astype(jnp.int32)[None, :]

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(boxes.astype(jnp.float32), invalid, thr)
    return (keep[0] > 0)[:n]
