"""Pallas TPU kernel for greedy NMS.

Optimized v2 of ops/nms.py's lax.fori_loop NMS (SURVEY.md section 7 step
2). The baseline's sequential chain is N loop steps of N-wide VPU work;
this kernel processes boxes in blocks of 64 like the reference's CUDA
bitmask kernel (reference: c++ext/maskrcnn/csrc/cuda/nms_cuda.cu:29-74)
— but where the CUDA version copies its bitmask to the HOST for the
final scan (nms_cuda.cu:107-131, a device sync per call), everything
here stays in VMEM: the sequential dependency only exists *between*
diagonal blocks, so the kernel walks ceil(N/64) diagonal steps, each
suppressing a full 64-row block against all later columns with VPU-wide
ops.

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


def _nms_kernel(boxes_ref, valid_ref, thr_ref, keep_ref, supp_ref):
    """Single-program kernel: boxes [N, 4] f32 in VMEM, keep [N] bool."""
    n = boxes_ref.shape[0]
    nblk = n // BLOCK

    thr = thr_ref[0]
    y1 = boxes_ref[:, 0]
    x1 = boxes_ref[:, 1]
    y2 = boxes_ref[:, 2]
    x2 = boxes_ref[:, 3]
    area = (y2 - y1 + 1.0) * (x2 - x1 + 1.0)

    # suppressed state for all N boxes, kept in a VMEM scratch row
    supp_ref[:] = jnp.logical_not(valid_ref[:])

    def diag_step(bi, _):
        start = bi * BLOCK
        row = pl.ds(start, BLOCK)
        ds = functools.partial(jax.lax.dynamic_slice_in_dim,
                               start_index=start, slice_size=BLOCK)
        # resolve survivors *within* the diagonal block sequentially
        ry1 = ds(y1)
        rx1 = ds(x1)
        ry2 = ds(y2)
        rx2 = ds(x2)
        rarea = ds(area)
        rsupp = supp_ref[row]

        # IoU among the block's own boxes: [BLOCK, BLOCK]
        iy1 = jnp.maximum(ry1[:, None], ry1[None, :])
        ix1 = jnp.maximum(rx1[:, None], rx1[None, :])
        iy2 = jnp.minimum(ry2[:, None], ry2[None, :])
        ix2 = jnp.minimum(rx2[:, None], rx2[None, :])
        ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
        iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
        inter = ih * iw
        iou = inter / (rarea[:, None] + rarea[None, :] - inter)
        r = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
        smat = (iou >= thr) & (c > r)

        def inner(i, s):
            alive = jnp.logical_not(s[i])
            return s | (smat[i] & alive)

        rsupp = jax.lax.fori_loop(0, BLOCK, inner, rsupp)
        supp_ref[row] = rsupp

        # block survivors suppress every later column in one VPU pass
        keep_blk = jnp.logical_not(rsupp)           # [BLOCK]
        cy1 = jnp.maximum(ry1[:, None], y1[None, :])
        cx1 = jnp.maximum(rx1[:, None], x1[None, :])
        cy2 = jnp.minimum(ry2[:, None], y2[None, :])
        cx2 = jnp.minimum(rx2[:, None], x2[None, :])
        ch = jnp.maximum(cy2 - cy1 + 1.0, 0.0)
        cw = jnp.maximum(cx2 - cx1 + 1.0, 0.0)
        cinter = ch * cw
        ciou = cinter / (rarea[:, None] + area[None, :] - cinter)
        col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, n), 1)
        later = col >= (bi + 1) * BLOCK
        hit = (ciou >= thr) & later & keep_blk[:, None]
        supp_ref[:] = supp_ref[:] | jnp.any(hit, axis=0)
        return 0

    jax.lax.fori_loop(0, nblk, diag_step, 0)
    keep_ref[:] = jnp.logical_not(supp_ref[:]) & valid_ref[:]


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

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.bool_),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((npad,), jnp.bool_)],
    )(boxes.astype(jnp.float32), valid.astype(jnp.bool_), thr)
    return keep[:n]
