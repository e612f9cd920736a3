"""Non-maximum suppression under static shapes.

TPU-native replacement for the reference's native NMS extension
(reference: c++ext/maskrcnn/csrc/cpu/nms_cpu.cpp:11-70 and
cuda/nms_cuda.cu:29-131). Three deliberate deviations from typical NMS
libraries, all matching the reference exactly:

* the **+1 pixel-area convention**: area = (y2-y1+1)*(x2-x1+1)
  (nms_cpu.cpp:26, 61-62);
* suppression at `iou >= threshold` (not `>`) (nms_cpu.cpp:65);
* the CUDA version's device->host bitmask sync point is gone — everything
  stays on device as a `lax.fori_loop` over a boolean keep-mask, so NMS
  can live inside one jitted graph.

The reference returns dynamically-sized index lists; XLA needs static
shapes, so we return a fixed-size boolean keep mask over score-sorted
inputs plus (optionally) padded top-k indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iou_plus_one(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the +1 area convention (nms_cpu.cpp:26,56-64)."""
    y1, x1, y2, x2 = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    w = jnp.maximum(xx2 - xx1 + 1.0, 0.0)
    h = jnp.maximum(yy2 - yy1 + 1.0, 0.0)
    inter = w * h
    union = areas[:, None] + areas[None, :] - inter
    return inter / union


def nms_mask(boxes: jnp.ndarray,
             valid: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS over boxes already sorted by descending score.

    The reference sorts by score then suppresses sequentially
    (nms_cpu.cpp:28, 42-68); here the caller provides sorted boxes (both
    reference call sites do their own sort first: model.py:1346, 1461).

    boxes: [N, 4] float (y1, x1, y2, x2), score-descending order.
    valid: [N] bool; padded rows never survive and never suppress.
    Returns keep: [N] bool.

    Greedy NMS is the unique solution of the well-founded recurrence
        suppressed[i] = OR_{j<i} (iou[j,i] >= thr & ~suppressed[j]
                                  & valid[j]),
    solved here by fixpoint iteration instead of an N-step sequential
    loop: each sweep is one full [N, N] mask-and-reduce (a microseconds
    VPU op), and after t sweeps every box whose suppression-chain depth
    is <= t has its final value. Chains are short in practice (<10 for
    thr 0.7), so the while_loop exits after ~5-10 sweeps — ~50x fewer
    sequential dependencies than the per-box scan, which dominated
    pipeline latency at 500 proposals.
    """
    n = boxes.shape[0]
    iou = _iou_plus_one(boxes.astype(jnp.float32))
    suppress_mat = iou >= iou_threshold  # [N, N]
    # Only rows (earlier, higher-scored boxes) can suppress later columns.
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    suppress_mat = suppress_mat & (col > row) & valid[:, None]

    def sweep(s):
        alive = jnp.logical_not(s)
        return jnp.any(suppress_mat & alive[:, None], axis=0)

    def body(carry):
        s, _ = carry
        s2 = sweep(s)
        return s2, jnp.any(s2 != s)

    suppressed, _ = jax.lax.while_loop(
        lambda c: c[1], body,
        (jnp.zeros((n,), jnp.bool_), jnp.asarray(True)))
    return jnp.logical_not(suppressed) & valid


def nms_mask_impl(boxes: jnp.ndarray, valid: jnp.ndarray,
                  iou_threshold: float, impl: str = "xla") -> jnp.ndarray:
    """Backend dispatch: "xla" (lax.fori_loop, any backend) or "pallas"
    (ops/nms_pallas.py TPU kernel, ~2.5x faster per call)."""
    if impl == "pallas":
        from maskrcnn_tpu.ops.nms_pallas import nms_mask_pallas
        return nms_mask_pallas(boxes, valid, iou_threshold)
    return nms_mask(boxes, valid, iou_threshold)


def nms_topk(boxes: jnp.ndarray,
             scores: jnp.ndarray,
             valid: jnp.ndarray,
             iou_threshold: float,
             k: int):
    """Sort by score, NMS, return padded top-k.

    Returns (boxes_k [k,4], scores_k [k], valid_k [k], index_k [k] into the
    *input* order). Padded slots hold zeros / False.
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]
    keep = nms_mask(sboxes, svalid, iou_threshold)
    # Stable partition: survivors first (they are already in score order).
    rank = jnp.where(keep, jnp.arange(keep.shape[0]),
                     keep.shape[0] + jnp.arange(keep.shape[0]))
    take = jnp.argsort(rank)[:k]
    out_valid = keep[take]
    out_boxes = jnp.where(out_valid[:, None], sboxes[take], 0.0)
    out_scores = jnp.where(out_valid, masked_scores[order][take], 0.0)
    out_index = jnp.where(out_valid, order[take], -1)
    return out_boxes, out_scores, out_valid, out_index


def soft_nms_scores(boxes: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, sigma: float,
                    iters: int) -> jnp.ndarray:
    """Gaussian Soft-NMS (Bodla et al., ICCV 2017) score decay.

    Instead of hard suppression, each selected box multiplies every
    still-unselected box's score by exp(-iou^2 / sigma); a box's final
    score is its value at its own selection time. The reference only
    has hard NMS — this is the standard drop-in protocol upgrade for
    crowded scenes, shaped for XLA: the inherently sequential
    select-and-decay loop is a `lax.scan` of `iters` steps over a
    precomputed [N, N] IoU matrix (each step is one argmax + one
    row-broadcast multiply, VPU work), and `iters` only needs to reach
    the number of detections actually kept downstream, not N.

    boxes: [N, 4]; scores: [N] (>= 0); valid: [N] bool.
    Returns final scores [N]: selected boxes keep their
    selection-time score, never-selected boxes (beyond `iters`, or
    invalid) return 0. Uses the same +1-area IoU as hard NMS, so the
    multiclass class-offset trick composes (cross-class iou == 0 and
    exp(0/sigma) == 1 -> no cross-class decay).
    """
    n = boxes.shape[0]
    iou = _iou_plus_one(boxes.astype(jnp.float32))
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def body(carry, _):
        cur, done = carry
        cand = jnp.where(done | ~valid, neg, cur)
        i = jnp.argmax(cand)
        has = cand[i] > neg  # anything left to select
        decay = jnp.exp(-(iou[i] ** 2) / sigma)
        decayed = jnp.where(done | ~has, cur, cur * decay)
        # the selected box's score is frozen, not self-decayed
        decayed = decayed.at[i].set(cur[i])
        done = done.at[i].set(done[i] | has)
        return (decayed, done), None

    (final, done), _ = jax.lax.scan(
        body, (scores.astype(jnp.float32), jnp.zeros((n,), jnp.bool_)),
        None, length=iters)
    return jnp.where(done, final, 0.0)


def multiclass_nms_mask(boxes: jnp.ndarray,
                        class_ids: jnp.ndarray,
                        valid: jnp.ndarray,
                        iou_threshold: float,
                        coord_span: float,
                        impl: str = "xla") -> jnp.ndarray:
    """Per-class NMS via the class-offset trick.

    Replaces the reference's per-class Python loop over `maskrcnn.nms`
    (reference: model.py:1454-1475). Offsetting each class's boxes to a
    disjoint coordinate range makes cross-class IoU exactly zero (the +1
    convention still leaves a gap because offsets exceed the span by 2),
    so one fixed-shape NMS call reproduces the per-class result.

    boxes must be sorted by descending score (globally; within each class
    that implies score order, which is all greedy NMS depends on).
    coord_span: strictly larger than any coordinate value (e.g. image dim).
    """
    offset = class_ids.astype(boxes.dtype)[:, None] * (coord_span + 2.0)
    return nms_mask_impl(boxes + offset, valid, iou_threshold, impl=impl)
