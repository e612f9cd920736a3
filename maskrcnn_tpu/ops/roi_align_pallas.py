"""Pallas TPU kernel for multilevel RoIAlign.

The XLA patch-gather formulation (ops/roi_align.py) is bound by the
VPU's gather element rate (~1/6 of HBM bandwidth at C=256). This kernel
replaces the gather with explicit DMA, pipelined across boxes with an
8-deep in-flight window so copies overlap compute. Two per-box paths,
selected in-kernel:

* **fit path** (the common case): one async copy brings the 32x40xC
  feature patch covering all of the box's bilinear footprints into
  VMEM; pool rows are P dynamic-slice 2-tap blends, and ALL PxP cells
  then come out of one dot_general against the one-hot x-weights.
* **wide path** (elongated boxes whose sample extent exceeds the patch
  window at their level — e.g. aspect>2.4 proposals routed to P2): per
  pool row, one async copy of the row pair across the FULL level width,
  then the same dot_general over the full width. Exact for any box,
  just more DMA bytes — and only the rare boxes pay it.

Semantics are identical to ops/roi_align._crop_core (single-sample
tf.crop_and_resize, extrapolation zeros); all sampling coordinates are
precomputed on the XLA side. The whole batch is one kernel launch:
levels AND images stack along the table's row axis, and the grid walks
B*N boxes in blocks of NBLK.

Mosaic constraints shaping the code (see ops/nms_pallas.py): dynamic
ref slices only on OUTER dims (patch/table rows; the table's W dim is
sublane-tiled by 8, so the patch's x-origin is aligned down to 8 and
the patch widened to 40); per-cell coordinate tables live in VMEM rows
and are indexed by the STATIC pool index; the kernel emits [px, py, c]
cells and the caller transposes once at the XLA level.

Caller contract: every pyramid level must be at least PATCH tall/wide
(true for the production 1024px config: P5 is 32x32). Smaller configs
use the XLA path (detection/pipeline._pool_rois checks statically).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.ops import roi_align

PATCH = 32       # patch rows (table rows are untiled: any origin)
# patch cols: the table's W dim is sublane-tiled by 8, so the DMA origin
# must be 8-aligned; 40 = 32 + 8 keeps full 31-cell span coverage after
# aligning the origin down.
PATCH_X = 40
NBUF = 8         # in-flight patch DMAs


def _kernel(rowoff_ref, rowb_ref, colb_ref, fit_ref, scale_ref, iy_ref,
            ty_ref, vy_ref, ix_ref, tx_ref, vx_ref, table_ref, out_ref,
            bufa, rowbuf, rbuf, sem, semb, *, pool: int):
    """One grid step pools NBLK boxes.

    SMEM blocks [1, 1, NBLK]: rowoff (level+image row offset), rowb/colb
    (clamped patch origin: global row / 8-aligned col), fit (1 = patch
    covers all samples), scale (f32 per-box dequantization factor —
    1.0 for float tables; for int8 tables the box's level scale, folded
    for free into the y-blend's existing vy multiply). VMEM blocks [1, 1, NBLK, pool]: iy/ix =
    LEVEL-coord floor cells (in-level, clipped), ty/tx fractional
    weights, vy/vx in-range flags; the wide path reads its DMA row
    origins from the VMEM iy_ref (rowoff + iy).
    table: [R, W, C] in HBM; out block: [1, NBLK, pool, pool, C] in
    [px, py, c] cell order.
    Scratch: bufa [NBUF, PATCH, PATCH_X, C], rowbuf [2, 2, W, C]
    (wide-path row pairs), rbuf [pool, W, C] f32.
    """
    nblk = out_ref.shape[1]
    w_dim = rbuf.shape[1]

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(rowb_ref[0, 0, i], PATCH),
                         pl.ds(pl.multiple_of(colb_ref[0, 0, i], 8),
                               PATCH_X), :],
            bufa.at[slot], sem.at[slot])

    for j in range(NBUF):
        get_dma(j, j).start()

    xiota_p = jax.lax.broadcasted_iota(jnp.int32, (pool, PATCH_X), 1)
    xiota_w = jax.lax.broadcasted_iota(jnp.int32, (pool, w_dim), 1)
    dn = (((1,), (1,)), ((), ()))   # contract the x axis

    def box_body(i, _):
        slot = jax.lax.rem(i, NBUF)
        get_dma(slot, i).wait()
        ya = rowb_ref[0, 0, i] - rowoff_ref[0, 0, i]
        xa = colb_ref[0, 0, i]

        tyv = ty_ref[0, 0, i]          # [pool] f32 (VMEM vector row)
        vyv = vy_ref[0, 0, i] * scale_ref[0, 0, i]
        txv = tx_ref[0, 0, i]
        vxv = vx_ref[0, 0, i]
        ixv = ix_ref[0, 0, i]
        iyv = iy_ref[0, 0, i]

        def x_weights(xiota, xoff):
            ix = (ixv - xoff)[:, None]
            return ((xiota == ix).astype(jnp.float32)
                    * (1.0 - txv)[:, None]
                    + (xiota == ix + 1).astype(jnp.float32)
                    * txv[:, None]) * vxv[:, None]     # [pool(q), X]

        @pl.when(fit_ref[0, 0, i] == 1)
        def _fit_path():
            for p in range(pool):      # static unroll
                row2 = bufa[slot, pl.ds(iyv[p] - ya, 2)] \
                    .astype(jnp.float32)
                rbuf[p, :PATCH_X] = (row2[0] * (1.0 - tyv[p])
                                     + row2[1] * tyv[p]) * vyv[p]
            # all PxP cells in one contraction: [q, X] x [p, X, C]
            cell = jax.lax.dot_general(
                x_weights(xiota_p, xa), rbuf[:, :PATCH_X], dn,
                preferred_element_type=jnp.float32)    # [q, p, C]
            out_ref[0, i] = cell.astype(out_ref.dtype)

        @pl.when(fit_ref[0, 0, i] == 0)
        def _wide_path():
            # sequential row-pair DMAs over the full (padded) width;
            # exact for any span. Rare boxes only.
            for p in range(pool):
                rowg = rowoff_ref[0, 0, i] + iyv[p]
                bslot = p % 2
                dma = pltpu.make_async_copy(
                    table_ref.at[pl.ds(rowg, 2), :, :],
                    rowbuf.at[bslot], semb.at[bslot])
                dma.start()
                dma.wait()
                r2 = rowbuf[bslot].astype(jnp.float32)
                rbuf[p] = (r2[0] * (1.0 - tyv[p])
                           + r2[1] * tyv[p]) * vyv[p]
            cell = jax.lax.dot_general(
                x_weights(xiota_w, 0), rbuf[:], dn,
                preferred_element_type=jnp.float32)
            out_ref[0, i] = cell.astype(out_ref.dtype)

        # refill the DMA window only after box i's patch was consumed
        # (slot i+NBUF aliases slot i)
        @pl.when(i + NBUF < nblk)
        def _():
            get_dma(slot, i + NBUF).start()

    jax.lax.fori_loop(0, nblk, box_body, None)


def _prep(boxes, lvl, heights, widths, row_offsets, pool):
    """XLA-side coordinate tables. boxes [M, 4] normalized (flat over
    batch*N); row_offsets [M] global table row offset per box (image +
    level)."""
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))
    h_max = jnp.asarray(heights - 1.0)[lvl]            # [M]
    w_max = jnp.asarray(widths - 1.0)[lvl]
    hl = jnp.asarray(heights)[lvl]
    wl = jnp.asarray(widths)[lvl]

    # literal reference op-order (see roi_align.sample_points): keeps
    # image-boundary extrapolation decisions identical to the xla path
    in_y, in_x = roi_align.sample_points(boxes, h_max, w_max, pool)

    vy = ((in_y >= 0.0) & (in_y <= h_max[:, None])).astype(jnp.float32)
    vx = ((in_x >= 0.0) & (in_x <= w_max[:, None])).astype(jnp.float32)

    ys = jnp.clip(jnp.floor(in_y), 0.0, jnp.maximum(h_max[:, None] - 1, 0))
    xs = jnp.clip(jnp.floor(in_x), 0.0, jnp.maximum(w_max[:, None] - 1, 0))
    ty = jnp.clip(in_y, 0.0, h_max[:, None]) - ys
    tx = jnp.clip(in_x, 0.0, w_max[:, None]) - xs

    # clamped patch origin; x is aligned DOWN to 8 (sublane tiling of
    # the table's W dim); fit = all footprints inside the window
    ya = jnp.clip(jnp.min(ys, axis=1), 0.0, jnp.maximum(hl - PATCH, 0))
    xa = jnp.floor(jnp.min(xs, axis=1) / 8.0) * 8.0
    xa = jnp.clip(xa, 0.0, jnp.maximum(wl - PATCH_X, 0))
    fit = ((jnp.max(ys, axis=1) - ya <= PATCH - 2)
           & (jnp.max(xs, axis=1) - xa <= PATCH_X - 2))

    return dict(
        rowoff=row_offsets.astype(jnp.int32),
        rowb=(row_offsets + ya).astype(jnp.int32),
        colb=xa.astype(jnp.int32),
        fit=fit.astype(jnp.int32),
        iy=ys.astype(jnp.int32), ty=ty, vy=vy,
        ix=xs.astype(jnp.int32), tx=tx, vx=vx)


def batched_multilevel_roi_align_pallas(
        features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
        pool_size: int, image_shape,
        level_scales: Sequence[jnp.ndarray] = None,
        out_dtype=None) -> jnp.ndarray:
    """Pallas multilevel RoIAlign for a batch.

    features: list of [B, H_l, W_l, C] (P2..P5); boxes: [B, N, 4]
    normalized. Returns [B, N, pool, pool, C] in the feature dtype
    (or `out_dtype`).

    level_scales: optional per-level f32 dequantization scales for
    int8 feature tables (Config.QUANT_INT8 serving path): each pooled
    value is blend(int8 taps) * scale[level(box)], applied in-kernel.
    The DMA is bandwidth-bound, so int8 tables run the kernel ~0.72x
    the bf16 time (benchmarks/gates/int8_roi_dma_gate.py); pass
    out_dtype (e.g. bf16) with them, since int8 outputs would truncate.
    """
    from maskrcnn_tpu.ops.roi_align import roi_levels

    heights = np.array([f.shape[1] for f in features], np.float32)
    widths = np.array([f.shape[2] for f in features], np.float32)
    assert heights.min() >= PATCH and widths.min() >= PATCH_X - 8, \
        "pallas roi_align needs every level >= the patch window"
    # the fit-path DMA always reads PATCH_X columns from the stacked
    # table, so the widest level must cover it (narrow levels alone —
    # all in [PATCH_X-8, PATCH_X) — would make that read run off the
    # table; unreachable from the FPN pipeline, reachable via this
    # public API)
    assert widths.max() >= PATCH_X, \
        f"pallas roi_align needs max level width >= {PATCH_X}"

    b, n = boxes.shape[:2]
    c = features[0].shape[-1]
    w_max_dim = int(widths.max())
    # one table: per image, levels stacked along rows; images stacked
    # along rows. [B * sum(H_l), W_max, C]
    per_img = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, 0), (0, w_max_dim - f.shape[2]),
                     (0, 0))) for f in features], axis=1)
    ht = per_img.shape[1]
    table = per_img.reshape(b * ht, w_max_dim, c)
    lvl_off = np.concatenate([[0], np.cumsum(heights)])[:-1] \
        .astype(np.float32)

    flat_boxes = boxes.reshape(b * n, 4)
    lvl = roi_levels(flat_boxes, image_shape)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), n)
    row_offsets = img_idx * float(ht) + jnp.asarray(lvl_off)[lvl]
    prep = _prep(flat_boxes, lvl, heights, widths, row_offsets,
                 pool_size)
    if level_scales is not None:
        scale = jnp.stack([jnp.asarray(s, jnp.float32)
                           for s in level_scales])[lvl]      # [M]
    else:
        scale = jnp.ones((b * n,), jnp.float32)

    m = b * n
    nblk = 32 if pool_size <= 8 else 8
    pad = (-m) % nblk
    total = m + pad
    grid = total // nblk

    def shape2(x, value=0):
        x = jnp.pad(x, [(0, pad)], constant_values=value)
        return x.reshape(grid, 1, nblk)

    def shape3(x):
        x = jnp.pad(x, [(0, pad), (0, 0)])
        return x.reshape(grid, 1, nblk, pool_size)

    smem2 = pl.BlockSpec((1, 1, nblk), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM)
    vmem3 = pl.BlockSpec((1, 1, nblk, pool_size),
                         lambda g: (g, 0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, pool=pool_size),
        grid=(grid,),
        in_specs=[
            smem2, smem2, smem2, smem2, smem2,
            vmem3, vmem3, vmem3, vmem3, vmem3, vmem3,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, nblk, pool_size, pool_size, c),
            lambda g: (g, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (grid, nblk, pool_size, pool_size, c),
            out_dtype or table.dtype),
        scratch_shapes=[
            pltpu.VMEM((NBUF, PATCH, PATCH_X, c), table.dtype),
            pltpu.VMEM((2, 2, w_max_dim, c), table.dtype),
            pltpu.VMEM((pool_size, w_max_dim, c), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(shape2(prep["rowoff"]), shape2(prep["rowb"]),
      shape2(prep["colb"]),
      # padding slots take the cheap fit path (patch at origin 0)
      shape2(prep["fit"], value=1),
      shape2(scale),
      shape3(prep["iy"]), shape3(prep["ty"]), shape3(prep["vy"]),
      shape3(prep["ix"]), shape3(prep["tx"]), shape3(prep["vx"]),
      table)
    # kernel emits [px, py, c] cells; swap back to [py, px, c]
    out = out.reshape(total, pool_size, pool_size, c)[:m]
    return out.transpose(0, 2, 1, 3).reshape(
        b, n, pool_size, pool_size, c)


def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                boxes: jnp.ndarray, pool_size: int,
                                image_shape) -> jnp.ndarray:
    """Single-image convenience wrapper: [N, P, P, C]."""
    return batched_multilevel_roi_align_pallas(
        [f[None] for f in features], boxes[None], pool_size,
        image_shape)[0]
