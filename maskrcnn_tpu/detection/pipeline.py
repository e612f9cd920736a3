"""End-to-end jitted detection pipeline.

TPU-native rebuild of the reference inference path (reference:
model.py:1095-1203 detect/predict, 1307-1382 rpn_refine, 1389-1487
mrn_refine). Every stage is fixed-shape and stays on device; the
reference's three host round-trips (CUDA-NMS bitmask scan, per-class NMS
Python loop, PIL mask pasting) are gone.

Dynamic-length results become padded tensors + validity masks:
* proposals: [RPN_NMS_MAX_ROIS_NUM] rows, `proposal_valid` mask;
* detections: [DETECTION_MAX_INSTANCES] rows, `valid` mask.
Padded proposal rows are excluded from the final detection set via the
validity mask — the reference never sees such rows because its lists are
dynamically sized (documented deviation; results for valid rows match).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.ops import boxes as box_ops
from maskrcnn_tpu.ops import nms as nms_ops
from maskrcnn_tpu.ops.image import normalize_image
from maskrcnn_tpu.ops.roi_align import multilevel_roi_align


class Detections(NamedTuple):
    """Final per-image detections, padded to DETECTION_MAX_INSTANCES."""

    class_ids: jnp.ndarray   # [D] int32 (0 = padding/background)
    scores: jnp.ndarray      # [D] float32
    boxes: jnp.ndarray       # [D, 4] float32, integral pixel coords
    valid: jnp.ndarray       # [D] bool


def rpn_refine(config: Config, anchors: jnp.ndarray,
               rpn_probs: jnp.ndarray, rpn_bbox: jnp.ndarray):
    """Proposal layer (reference: model.py:1307-1382), single image.

    anchors: [A, 4] pixel coords; rpn_probs: [A, 2]; rpn_bbox: [A, 4].
    Returns (proposals [R, 4] normalized, valid [R] bool),
    R = RPN_NMS_MAX_ROIS_NUM.
    """
    return rpn_refine_scores(config, anchors, rpn_probs[:, 1], rpn_bbox)


def rpn_refine_scores(config: Config, anchors: jnp.ndarray,
                      scores: jnp.ndarray, rpn_bbox: jnp.ndarray):
    """rpn_refine core on fg scores [A] (MaskRCNN.rpn_scores output).

    rpn_bbox may be bf16: only the k top-k survivors are gathered and
    cast to f32 — the conv output is bf16 either way, so deferring the
    cast past the gather is exact and skips writing [A, 4] f32.
    """
    # Pre-NMS top-k (model.py:1345-1350): k = min(500, A).
    k = config.PRE_NMS_LIMIT
    top_scores, order = jax.lax.top_k(scores, k)
    deltas = (rpn_bbox[order].astype(jnp.float32)
              * jnp.asarray(config.RPN_BBOX_STD_DEV, jnp.float32))
    boxes = box_ops.refine_boxes(anchors[order], deltas)

    h, w = config.IMAGE_SHAPE[:2]
    boxes = box_ops.clip_boxes(boxes, (0.0, 0.0, float(h), float(w)))

    keep = nms_ops.nms_mask_impl(boxes, jnp.ones((k,), jnp.bool_),
                                 config.RPN_NMS_THRESHOLD,
                                 impl=config.NMS_IMPL)

    # Compact survivors (already score-ordered) to the front, pad to R.
    r = config.RPN_NMS_MAX_ROIS_NUM
    rank = jnp.where(keep, jnp.arange(k), k + jnp.arange(k))
    take = jnp.argsort(rank)[:r]
    valid = keep[take]
    norm = jnp.asarray([h, w, h, w], jnp.float32)
    proposals = jnp.where(valid[:, None], boxes[take] / norm, 0.0)
    if r > k:
        pad = r - k
        proposals = jnp.pad(proposals, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    return proposals, valid


def mrn_refine(config: Config, proposals: jnp.ndarray,
               proposal_valid: jnp.ndarray, probs: jnp.ndarray,
               deltas: jnp.ndarray, window: jnp.ndarray,
               delta_std=None, round_boxes: bool = True) -> Detections:
    """Detection refinement (reference: model.py:1389-1487), single image.

    proposals: [R, 4] normalized; probs: [R, K]; deltas: [R, K, 4];
    window: [4] (y1, x1, y2, x2) pixel coords of the un-padded region.
    delta_std: override for the delta de-normalization (the cascade's
    last stage trains with a tighter std schedule); None keeps the
    reference behavior.
    round_boxes: keep the reference's round-to-int quirk (model.py:1432).
    The TTA path defers rounding until after the cross-pass merge so the
    two passes don't carry +-1px quantization jitter into box fusion
    (single-pass behavior is unchanged: default True).
    """
    r, num_classes = probs.shape
    class_ids = jnp.argmax(probs, axis=1)
    idx = jnp.arange(r)
    class_scores = probs[idx, class_ids]
    deltas_specific = deltas[idx, class_ids]

    # model.py:1418-1422 uses RPN_BBOX_STD_DEV here (not BBOX_STD_DEV).
    std = (jnp.asarray(config.RPN_BBOX_STD_DEV, jnp.float32)
           if delta_std is None else jnp.asarray(delta_std, jnp.float32))
    refined = box_ops.refine_boxes(proposals, deltas_specific * std)

    h, w = config.IMAGE_SHAPE[:2]
    boxes = refined * jnp.asarray([h, w, h, w], jnp.float32)
    boxes = box_ops.clip_boxes(boxes, window)
    if round_boxes:
        # Round to ints before NMS (model.py:1432) — a reference quirk
        # kept for score parity.
        boxes = jnp.round(boxes)

    keep = proposal_valid & (class_ids > 0)
    if config.DETECTION_MIN_CONFIDENCE:
        keep = keep & (class_scores >= config.DETECTION_MIN_CONFIDENCE)

    # Global score sort, then per-class NMS via class offsets
    # (replaces the per-class loop at model.py:1454-1475).
    masked_scores = jnp.where(keep, class_scores, -1.0)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    sclasses = class_ids[order]
    svalid = keep[order]
    d = config.DETECTION_MAX_INSTANCES

    if config.DETECTION_SOFT_NMS_SIGMA > 0:
        # Gaussian Soft-NMS protocol (opt-in; the reference only has
        # hard NMS). The class-offset trick zeroes cross-class IoU, so
        # decay never crosses classes; `iters=d` selections suffice
        # because only the top-d survivors are kept anyway.
        offset = (sclasses.astype(sboxes.dtype)[:, None]
                  * (float(max(h, w)) + 2.0))
        final = nms_ops.soft_nms_scores(
            sboxes + offset, jnp.maximum(masked_scores[order], 0.0),
            svalid, config.DETECTION_SOFT_NMS_SIGMA, iters=d)
        floor = max(config.DETECTION_MIN_CONFIDENCE, 1e-3)
        fvalid = svalid & (final >= floor)
        fscores = jnp.where(fvalid, final, -1.0)
        take = jnp.argsort(-fscores)[:d]
        valid = fvalid[take]
        return Detections(
            class_ids=jnp.where(valid, sclasses[take], 0)
            .astype(jnp.int32),
            scores=jnp.where(valid, final[take], 0.0),
            boxes=jnp.where(valid[:, None], sboxes[take], 0.0),
            valid=valid)

    nms_keep = nms_ops.multiclass_nms_mask(
        sboxes, sclasses, svalid, config.DETECTION_NMS_THRESHOLD,
        coord_span=float(max(h, w)), impl=config.NMS_IMPL)

    # Top DETECTION_MAX_INSTANCES by score (model.py:1478-1480); the
    # sorted survivors are already in score order.
    rank = jnp.where(nms_keep, jnp.arange(r), r + jnp.arange(r))
    take = jnp.argsort(rank)[:d]
    valid = nms_keep[take]
    return Detections(
        class_ids=jnp.where(valid, sclasses[take], 0).astype(jnp.int32),
        scores=jnp.where(valid, masked_scores[order][take], 0.0),
        boxes=jnp.where(valid[:, None], sboxes[take], 0.0),
        valid=valid)


def _pool_rois(feature_maps, boxes, pool_size, image_shape,
               impl: str = "xla", quant_scales=None):
    """vmap multilevel RoIAlign over the batch: [B, N, 4] -> [B,N,P,P,C].

    impl="pallas" uses the DMA kernel (ops/roi_align_pallas.py) when
    every pyramid level is large enough for its patch window (static
    check); inference-only — the kernel has no vjp. impl="auto" routes
    by batch size: the kernel's per-box issue overhead amortizes at
    batch >= 8 (+3% pipeline at b48) but regresses batch-1 latency
    (18 vs 10 ms at b1, re-measured round 3 second pass), so small
    batches take the XLA patch-gather.

    quant_scales: optional per-level f32 activation scales (P2..P5,
    the quant tree's rpn/P{i} entries). Pallas path only: the feature
    tables are re-quantized to int8 with the SAME quantize_tensor
    subgraph the int8 RPN emits (XLA CSEs the two) and the kernel DMAs
    half the bytes, dequantizing in-kernel — 0.72x the bf16 kernel time
    (benchmarks/gates/int8_roi_dma_gate.py). The XLA gather path
    ignores it (gathers are element-rate bound; int8 tables measured
    SLOWER there, see BENCHMARKS.md round-3 negative results)."""
    mrn_feats = [f for f in feature_maps[:4]]  # P2..P5 only (model.py:1153)

    if impl == "auto":
        # kernel is TPU-only (mosaic); CPU meshes take the XLA path
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = "pallas" if (on_tpu and boxes.shape[0] >= 8) else "xla"
    if impl == "pallas":
        from maskrcnn_tpu.ops.roi_align_pallas import (
            PATCH, PATCH_X, batched_multilevel_roi_align_pallas)
        if min(f.shape[1] for f in mrn_feats) >= PATCH and \
                min(f.shape[2] for f in mrn_feats) >= PATCH_X - 8:
            if quant_scales is not None:
                from maskrcnn_tpu.quant import quantize_tensor
                q_feats = [quantize_tensor(f, s)
                           for f, s in zip(mrn_feats, quant_scales)]
                return batched_multilevel_roi_align_pallas(
                    q_feats, boxes, pool_size, image_shape,
                    level_scales=quant_scales,
                    out_dtype=mrn_feats[0].dtype)
            return batched_multilevel_roi_align_pallas(
                mrn_feats, boxes, pool_size, image_shape)

    def per_image(feats, b):
        return multilevel_roi_align(feats, b, pool_size, image_shape)

    return jax.vmap(per_image)(mrn_feats, boxes)


def detect_boxes(model: MaskRCNN, params, images: jnp.ndarray,
                 windows: jnp.ndarray, round_boxes: bool = True):
    """Box pipeline prefix: normalize -> backbone -> RPN -> proposals ->
    (cascade) box head -> detection refinement.

    Returns (feats, det, q_scales): the FPN maps and per-level int8
    scales are handed back so the caller can pool mask features from
    them (detect_and_pool_masks) or merge several detection sets first
    (detect_and_pool_masks_tta, which passes round_boxes=False to keep
    sub-pixel coordinates for the cross-pass box fusion)."""
    config = model.config
    h, w = config.IMAGE_SHAPE[:2]

    x = normalize_image(images, config.MEAN_PIXEL)
    feats = model.backbone(params, x)
    # fused inference RPN (one 18-chan 1x1, no [B, A, 2] probs, bf16
    # deltas until the top-k gather) — equals rpn_detect + probs[:, 1]
    rpn_fg, rpn_bbox = model.rpn_scores(params, feats)

    anchors = jnp.asarray(model.anchors())
    proposals, pvalid = jax.vmap(
        lambda s, b: rpn_refine_scores(config, anchors, s, b))(
            rpn_fg, rpn_bbox)

    # int8 RoIAlign feature tables (pallas path only): reuse the quant
    # tree's per-level RPN input scales so the quantized maps CSE with
    # the RPN's own
    q_scales = None
    if config.QUANT_INT8 and config.QUANT_INT8_ROI and "quant" in params:
        acts = params["quant"]["acts"]
        if all(f"rpn/P{i}" in acts for i in range(4)):
            q_scales = [acts[f"rpn/P{i}"] for i in range(4)]

    b, r = proposals.shape[:2]
    stages = max(1, len(config.CASCADE_STAGES))
    std_base = jnp.asarray(config.BBOX_STD_DEV, jnp.float32)
    rois = proposals
    probs_sum = None
    for i in range(stages):
        pooled = _pool_rois(feats, rois, config.POOL_SIZE,
                            config.IMAGE_SHAPE, impl=config.ROI_IMPL,
                            quant_scales=q_scales)
        _, p_i, mrn_deltas = model.classify_stage(
            params, pooled.reshape(b * r, *pooled.shape[2:]), i)
        p_i = p_i.reshape(b, r, -1)
        mrn_deltas = mrn_deltas.reshape(b, r, config.NUM_CLASSES, 4)
        probs_sum = p_i if probs_sum is None else probs_sum + p_i
        if i < stages - 1:
            # refine the rois with the best foreground class's deltas,
            # de-normalized by stage i's std schedule (Cascade R-CNN
            # inference; stage-averaged classification below)
            fg = jnp.argmax(p_i[..., 1:], axis=-1) + 1      # [B, R]
            sel = jnp.take_along_axis(
                mrn_deltas,
                jnp.broadcast_to(fg[..., None, None], (b, r, 1, 4)),
                axis=2)[:, :, 0]
            sel = sel.astype(jnp.float32) * (std_base / (i + 1))
            rois = box_ops.refine_boxes(rois, sel)
            rois = box_ops.clip_boxes(rois, (0.0, 0.0, 1.0, 1.0))
            rois = jnp.where(pvalid[..., None], rois, 0.0)
    mrn_probs = probs_sum / stages
    delta_std = None if stages == 1 else tuple(
        float(s) / stages for s in config.BBOX_STD_DEV)

    det = jax.vmap(lambda p, v, pr, dl, win: mrn_refine(
        config, p, v, pr, dl, win, delta_std=delta_std,
        round_boxes=round_boxes))(
            rois, pvalid, mrn_probs, mrn_deltas, windows)
    return feats, det, q_scales


def _pool_mask_features(model: MaskRCNN, feats, det: Detections,
                        q_scales):
    """Mask-head RoIAlign on final detection boxes.

    Boxes are normalized per axis. The reference divides by h only
    (model.py:1188) under its square-canvas assumption — identical to
    [h, w, h, w] when h == w, and the per-axis form stays correct for
    rectangular IMAGE_CANVAS."""
    config = model.config
    h, w = config.IMAGE_SHAPE[:2]
    mask_rois = det.boxes / jnp.asarray([h, w, h, w], jnp.float32)
    return _pool_rois(feats, mask_rois, config.MASK_POOL_SIZE,
                      config.IMAGE_SHAPE, impl=config.ROI_IMPL,
                      quant_scales=q_scales)


def detect_and_pool_masks(model: MaskRCNN, params, images: jnp.ndarray,
                          windows: jnp.ndarray):
    """Pipeline prefix up to (and including) the mask-head RoIAlign:
    normalize -> backbone -> RPN -> proposals -> box head -> refine ->
    mask RoI pool. Returns (det, pooled_m [B, D, 14, 14, C]).

    Split out of predict_step so quant.py can calibrate the mask head's
    activation scales on the SAME pooled features production will feed
    it (quant.calibrate_heads)."""
    feats, det, q_scales = detect_boxes(model, params, images, windows)
    return det, _pool_mask_features(model, feats, det, q_scales)


def flip_windows(windows: jnp.ndarray, w: int) -> jnp.ndarray:
    """Mirror [B, 4] (y1, x1, y2, x2) canvas windows about canvas W."""
    return jnp.stack([windows[:, 0], w - windows[:, 3],
                      windows[:, 2], w - windows[:, 1]], axis=-1)


def flip_boxes(boxes: jnp.ndarray, w: int) -> jnp.ndarray:
    """Mirror [..., 4] (y1, x1, y2, x2) boxes about canvas width w.

    x2 is exclusive (mask-extent max index + 1, data/coco.py box
    build), so a box spanning columns [x1, x2) maps to [w-x2, w-x1)."""
    return jnp.stack([boxes[..., 0], w - boxes[..., 3],
                      boxes[..., 2], w - boxes[..., 1]], axis=-1)


def merge_detections(config: Config, a: Detections,
                     b: Detections) -> Detections:
    """Merge two per-image detection sets with box fusion + per-class NMS.

    Both sets are [B, D] slots in the SAME (un-flipped) coordinate
    frame. With TTA_FUSION_IOU > 0 (default 0.5) each detection's
    coordinates are first replaced by the score-weighted average of all
    same-class boxes (itself included) with IoU >= the threshold — the
    standard Detectron-style flip-TTA coordinate ensemble, written as
    one fixed-shape masked matmul. Matched flip pairs thereby average
    their localization noise instead of keeping one pass's box verbatim;
    a detection found by only one pass keeps its own coordinates
    exactly (self-weight s_i / s_i), and when both passes emit the same
    box the fusion is the identity, so the merge degrades to exactly
    the reference's single per-class NMS (model.py:1454-1475).
    Then the union is re-sorted by score, deduplicated with the same
    class-offset NMS the single-pass refinement uses, and cut back to
    the top DETECTION_MAX_INSTANCES slots.

    With DETECTION_SOFT_NMS_SIGMA > 0 the dedup is Gaussian soft-NMS
    (same select-and-decay + score floor as mrn_refine's soft path) —
    a hard-NMS merge here would re-suppress the crowded-scene
    detections soft-NMS deliberately retained in each pass (advisor
    r3), silently degrading TTA+soft-NMS to hard-NMS behavior.
    Known composition quirk (advisor r4): the per-pass scores entering
    this merge are ALREADY soft-NMS-decayed by mrn_refine, so intra-pass
    neighbor pairs get a second exp(-iou^2/sigma) decay here. The A/B
    gate measures the composition as AP-neutral, but composed
    TTA+soft-NMS scores are NOT calibration-comparable to single-pass
    soft-NMS scores."""
    h, w = config.IMAGE_SHAPE[:2]
    boxes = jnp.concatenate([a.boxes, b.boxes], axis=1)
    scores = jnp.concatenate([a.scores, b.scores], axis=1)
    class_ids = jnp.concatenate([a.class_ids, b.class_ids], axis=1)
    valid = jnp.concatenate([a.valid, b.valid], axis=1)
    d = config.DETECTION_MAX_INSTANCES

    def per_image(bx, sc, ci, va):
        n = bx.shape[0]
        masked = jnp.where(va, sc, -1.0)
        if config.TTA_FUSION_IOU > 0:
            # Score-weighted coordinate fusion over same-class matches.
            # The class-offset trick zeroes cross-class IoU so the
            # match mask never crosses classes.
            off = ci.astype(jnp.float32)[:, None] * (float(max(h, w)) + 2.0)
            iou = nms_ops._iou_plus_one(bx.astype(jnp.float32) + off)
            match = (iou >= config.TTA_FUSION_IOU) & va[None, :] & va[:, None]
            wgt = jnp.where(match, jnp.maximum(masked, 0.0)[None, :], 0.0)
            wsum = wgt.sum(axis=1, keepdims=True)
            fused = (wgt @ bx.astype(jnp.float32)) / jnp.maximum(wsum, 1e-8)
            bx = jnp.where(va[:, None] & (wsum > 0), fused, bx)
        order = jnp.argsort(-masked)
        sb, ss, sc_ids, sv = bx[order], masked[order], ci[order], va[order]
        if config.DETECTION_SOFT_NMS_SIGMA > 0:
            offset = (sc_ids.astype(sb.dtype)[:, None]
                      * (float(max(h, w)) + 2.0))
            final = nms_ops.soft_nms_scores(
                sb + offset, jnp.maximum(ss, 0.0), sv,
                config.DETECTION_SOFT_NMS_SIGMA, iters=d)
            floor = max(config.DETECTION_MIN_CONFIDENCE, 1e-3)
            fvalid = sv & (final >= floor)
            fscores = jnp.where(fvalid, final, -1.0)
            take = jnp.argsort(-fscores)[:d]
            v = fvalid[take]
            return Detections(
                class_ids=jnp.where(v, sc_ids[take], 0)
                .astype(jnp.int32),
                scores=jnp.where(v, final[take], 0.0),
                boxes=jnp.where(v[:, None], sb[take], 0.0),
                valid=v)
        keep = nms_ops.multiclass_nms_mask(
            sb, sc_ids, sv, config.DETECTION_NMS_THRESHOLD,
            coord_span=float(max(h, w)), impl=config.NMS_IMPL)
        rank = jnp.where(keep, jnp.arange(n), n + jnp.arange(n))
        take = jnp.argsort(rank)[:d]
        v = keep[take]
        return Detections(
            class_ids=jnp.where(v, sc_ids[take], 0).astype(jnp.int32),
            scores=jnp.where(v, ss[take], 0.0),
            boxes=jnp.where(v[:, None], sb[take], 0.0),
            valid=v)

    return jax.vmap(per_image)(boxes, scores, class_ids, valid)


def detect_and_pool_masks_tta(model: MaskRCNN, params,
                              images: jnp.ndarray, windows: jnp.ndarray):
    """Horizontal-flip test-time augmentation (config.TTA_HFLIP).

    The box pipeline runs twice — once on the canvas and once on its
    x-mirror — the mirrored detections are mapped back and the union is
    merged with per-class NMS (merge_detections). Mask features are
    pooled ONCE, from the un-flipped pass's FPN maps on the merged
    boxes, so the mask head costs the same as a single pass. The
    reference has no TTA; this is the standard Detectron-style flip
    ensemble, shaped for XLA: both passes are the same static program,
    so the jit cache holds one executable and the flip is a free
    device-side reverse."""
    config = model.config
    w = int(config.IMAGE_SHAPE[1])
    # Sub-pixel boxes through both passes (round_boxes=False): the
    # reference's int-rounding quirk would add +-1px cross-pass jitter
    # that the box fusion would otherwise average INTO the result.
    # Rounding is applied once, after the merge, so the output contract
    # (integral pixel coords) matches the single-pass path.
    feats, det, q_scales = detect_boxes(model, params, images, windows,
                                        round_boxes=False)
    det_f = detect_boxes(model, params, images[:, :, ::-1],
                         flip_windows(windows, w), round_boxes=False)[1]
    det_f = Detections(class_ids=det_f.class_ids, scores=det_f.scores,
                       boxes=jnp.where(det_f.valid[..., None],
                                       flip_boxes(det_f.boxes, w), 0.0),
                       valid=det_f.valid)
    det = merge_detections(config, det, det_f)
    det = det._replace(boxes=jnp.where(det.valid[..., None],
                                       jnp.round(det.boxes), 0.0))
    return det, _pool_mask_features(model, feats, det, q_scales)


def decode_keypoints(config: Config, kp_logits: jnp.ndarray,
                     boxes: jnp.ndarray, valid: jnp.ndarray):
    """Heatmap argmax -> canvas keypoint coordinates.

    kp_logits: [N, Hh, Wh, K] logits; boxes: [N, 4] canvas pixel
    (y1, x1, y2, x2); valid: [N] bool.
    Returns [N, K, 3] float32 (y, x, score): the center of the argmax
    heatmap cell mapped back into the box, score = spatial softmax
    peak probability. Invalid detections decode to zeros.
    """
    n, hh, hw, k = kp_logits.shape
    flat = jnp.moveaxis(kp_logits, -1, 1).reshape(n, k, hh * hw)
    probs = jax.nn.softmax(flat, axis=-1)
    idx = jnp.argmax(flat, axis=-1)                       # [N, K]
    score = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
    iy = (idx // hw).astype(jnp.float32)
    ix = (idx % hw).astype(jnp.float32)
    y1, x1, y2, x2 = [boxes[:, i, None] for i in range(4)]
    y = y1 + (iy + 0.5) / hh * (y2 - y1)
    x = x1 + (ix + 0.5) / hw * (x2 - x1)
    out = jnp.stack([y, x, score], axis=-1)               # [N, K, 3]
    return jnp.where(valid[:, None, None], out, 0.0)


@functools.partial(jax.jit, static_argnums=(0,))
def predict_step(model: MaskRCNN, params, images: jnp.ndarray,
                 windows: jnp.ndarray) -> Dict[str, Any]:
    """Batched end-to-end inference (reference: model.py:1140-1203).

    images: [B, H, W, 3] uint8 (resized+padded canvas).
    windows: [B, 4] float32 un-padded region per image.
    Returns dict of padded detection tensors incl. full-image masks.
    """
    config = model.config
    h, w = config.IMAGE_SHAPE[:2]

    run = (detect_and_pool_masks_tta if config.TTA_HFLIP
           else detect_and_pool_masks)
    det, pooled_m = run(model, params, images, windows)
    b, d = pooled_m.shape[:2]
    mask_probs = model.predict_masks(
        params, pooled_m.reshape(b * d, *pooled_m.shape[2:]))
    mask_probs = mask_probs.reshape(b, d, *mask_probs.shape[1:])  # [B,D,28,28,K]

    # Select each detection's class channel, then paste on device
    # (replaces data.py:287-314 full_masks PIL loop). Paste is chunked
    # over the flattened batch*detections to bound transient HBM.
    sel = jnp.take_along_axis(
        mask_probs, det.class_ids[:, :, None, None, None], axis=-1)
    sel = sel[..., 0]  # [B, D, 28, 28]

    # Only the bit-packed form leaves the step (1 bit/pixel; unpack
    # with np.unpackbits or ops.bits.unpack_masks) — and the pack is
    # fused into the paste chunks so the full-canvas bool (~2.4 GB at
    # b48/D=50) never touches HBM at all.
    from maskrcnn_tpu.ops.mask_paste import paste_masks_packed
    packed = paste_masks_packed(
        sel.reshape(b * d, *sel.shape[2:]),
        det.boxes.reshape(b * d, 4),
        det.valid.reshape(b * d), h, w)
    out = {
        "class_ids": det.class_ids,
        "scores": det.scores,
        "boxes": det.boxes,
        "valid": det.valid,
        "masks_packed": packed.reshape(b, d, h, packed.shape[-1]),
    }
    if config.NUM_KEYPOINTS > 0:
        # keypoint branch on the same pooled RoIs the mask head used,
        # restricted to the top-K score-ordered detection slots (the
        # OKS protocol's maxDets; the head is ~7.4 GFLOP/RoI)
        n = min(config.KEYPOINT_MAX_INSTANCES or d, d)
        pooled_k = pooled_m[:, :n]
        kp_logits = model.predict_keypoints(
            params, pooled_k.reshape(b * n, *pooled_k.shape[2:]))
        kp = decode_keypoints(config, kp_logits,
                              det.boxes[:, :n].reshape(b * n, 4),
                              det.valid[:, :n].reshape(b * n))
        out["keypoints"] = kp.reshape(b, n, config.NUM_KEYPOINTS, 3)
    return out
