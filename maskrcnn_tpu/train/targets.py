"""On-device training target samplers (fixed shapes, threefry RNG).

TPU-native rewrites of the reference's two samplers:

* `rpn_targets` <- rpn_samples (reference: data.py:449-591), which the
  reference runs *per image on the host data loader*, including a pure
  Python loop over positive anchors — the training-pipeline hot spot
  identified in SURVEY.md section 3.2. Here it is one vectorized jitted op
  inside the train step: the 261888 x G IoU matrix is a single VPU pass.
* `mrn_targets` <- mrn_samples (reference: model.py:396-576), whose
  dynamic-size positive/negative lists become fixed-size slots plus masks.

Random subsampling uses random-priority top-k, which reproduces the
reference's `np.random.choice(..., replace=False)` / `torch.randperm`
subsampling in distribution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.ops import boxes as box_ops
from maskrcnn_tpu.ops.roi_align import indexed_crop_and_resize


def _masked_iou(boxes1, boxes2, valid2):
    """IoU with invalid columns forced to 0 (padded gt are zero boxes,
    whose 0-area IoU is nan/0 in the reference numpy; masking is the
    static-shape equivalent)."""
    iou = box_ops.box_iou(boxes1, boxes2)
    iou = jnp.nan_to_num(iou, nan=0.0)
    return jnp.where(valid2[None, :], iou, 0.0)


def _random_keep(key, eligible: jnp.ndarray, limit,
                 limit_bound: int = 0) -> jnp.ndarray:
    """Keep at most `limit` of the eligible entries, uniformly at random.

    Equivalent to np.random.choice without replacement of the surplus
    (data.py:544-557) / randperm subsampling (model.py:468-472).
    `limit` may be a traced scalar; `limit_bound` is its static upper
    bound — when given, selection uses top_k(k=bound) instead of two
    full argsorts over N (which at 261,888 anchors cost milliseconds
    per image on the train step's critical path).
    """
    n = eligible.shape[0]
    priority = jax.random.uniform(key, (n,))
    priority = jnp.where(eligible, priority, 2.0)  # ineligible last
    if limit_bound and limit_bound < n:
        _, idxs = jax.lax.top_k(-priority, limit_bound)
        keep = jnp.zeros((n,), jnp.bool_).at[idxs].set(
            jnp.arange(limit_bound) < limit)
        return eligible & keep
    order = jnp.argsort(priority)
    rank = jnp.argsort(order)  # rank[i] = position of i in the shuffle
    return eligible & (rank < limit)


class RPNTargets(NamedTuple):
    rpn_match: jnp.ndarray  # [A] int32: 1 pos, -1 neg, 0 neutral
    rpn_bbox: jnp.ndarray   # [RPN_TRAIN_ANCHORS_PER_IMAGE, 4] float32


def rpn_targets(config: Config, key, anchors: jnp.ndarray,
                gt_class_ids: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray) -> RPNTargets:
    """Single-image RPN match/delta targets (reference: data.py:449-591).

    anchors: [A, 4] pixel coords; gt_class_ids: [G] (negative = crowd);
    gt_boxes: [G, 4] pixel coords; gt_valid: [G] bool for padded slots.
    """
    k_pos, k_neg = jax.random.split(key)
    a = anchors.shape[0]

    is_crowd = (gt_class_ids < 0) & gt_valid
    is_instance = (gt_class_ids > 0) & gt_valid

    # One [A, G] IoU matrix, masked two ways (crowd exclusion
    # data.py:496-509 / instance matching) — computing it twice would
    # double the largest tensor in the sampler.
    raw_iou = jnp.nan_to_num(box_ops.box_iou(anchors, gt_boxes), nan=0.0)
    crowd_iou = jnp.where(is_crowd[None, :], raw_iou, 0.0)
    no_crowd = jnp.max(crowd_iou, axis=1, initial=0.0) < 0.001

    overlaps = jnp.where(is_instance[None, :], raw_iou, 0.0)  # [A, G]
    anchor_iou_max = jnp.max(overlaps, axis=1, initial=0.0)
    # Padded columns are 0; force argmax away from them when real gt exist.
    anchor_iou_argmax = jnp.argmax(
        jnp.where(is_instance[None, :], overlaps, -1.0), axis=1)

    match = jnp.zeros((a,), jnp.int32)
    # 1. negatives (data.py:532)
    match = jnp.where((anchor_iou_max < 0.3) & no_crowd, -1, match)
    # 2. per-gt best anchor is positive regardless of IoU (data.py:536-537)
    gt_best_anchor = jnp.argmax(overlaps, axis=0)  # [G]
    # scatter-max so a padded gt can never erase a real gt's force bit
    forced = jnp.zeros((a,), jnp.int32).at[gt_best_anchor].max(
        is_instance.astype(jnp.int32), mode="drop")
    match = jnp.where(forced > 0, 1, match)
    # 3. high-IoU positives (data.py:540)
    match = jnp.where(anchor_iou_max >= 0.7, 1, match)

    # Subsample (data.py:544-557): <=half positive, total budget fixed.
    t = config.RPN_TRAIN_ANCHORS_PER_IMAGE
    pos = _random_keep(k_pos, match == 1, t // 2, limit_bound=t)
    n_pos = pos.sum()
    neg = _random_keep(k_neg, match == -1, t - n_pos, limit_bound=t)
    match = jnp.where(pos, 1, jnp.where(neg, -1, 0))

    # Delta targets for positives, packed in ascending anchor index order
    # (the reference's np.where iteration order, data.py:561-589);
    # top_k(-key) = first t of argsort(key), without the full-A sort.
    idx = jnp.arange(a)
    pos_rank_key = jnp.where(pos, idx, a + idx)
    _, packed = jax.lax.top_k(-pos_rank_key, t)
    packed_valid = pos[packed]
    tgt_gt = gt_boxes[anchor_iou_argmax[packed]]
    deltas = box_ops.box_deltas(anchors[packed], tgt_gt)
    deltas = deltas / jnp.asarray(config.RPN_BBOX_STD_DEV, jnp.float32)
    deltas = jnp.where(packed_valid[:, None], deltas, 0.0)
    return RPNTargets(rpn_match=match, rpn_bbox=deltas)


class MRNTargets(NamedTuple):
    rois: jnp.ndarray              # [T, 4] normalized
    class_ids: jnp.ndarray         # [T] int32 (0 for negative/pad)
    deltas: jnp.ndarray            # [T, 4] float32 (positives only)
    masks: jnp.ndarray             # [T, 28, 28] float32 0/1
    valid: jnp.ndarray             # [T] bool: real roi (pos or neg)
    positive: jnp.ndarray          # [T] bool
    gt_assignment: jnp.ndarray     # [T] int32 matched gt index (pos only)


def mrn_targets(config: Config, key, proposals: jnp.ndarray,
                proposal_valid: jnp.ndarray, gt_class_ids: jnp.ndarray,
                gt_boxes: jnp.ndarray, gt_masks: jnp.ndarray,
                gt_valid: jnp.ndarray,
                pos_iou: float = 0.5) -> MRNTargets:
    """Single-image head targets (reference: model.py:396-576 mrn_samples).

    proposals: [R, 4] normalized; gt_boxes: [G, 4] normalized;
    gt_masks: [G, H, W] (uint8/bool/float); gt_class_ids: [G]
    (negative = crowd).
    Layout: slot 0..P-1 hold positives (P = TRAIN_ROIS_PER_IMAGE *
    ROI_POSITIVE_RATIO), the rest negatives — the reference concatenates
    positives then negatives the same way (model.py:532-533).
    """
    k_pos, k_neg = jax.random.split(key)
    t = config.TRAIN_ROIS_PER_IMAGE
    p_cap = int(t * config.ROI_POSITIVE_RATIO)  # 33 for the COCO config
    r = proposals.shape[0]
    mh, mw = config.MASK_SHAPE

    is_crowd = (gt_class_ids < 0) & gt_valid
    is_instance = (gt_class_ids > 0) & gt_valid

    crowd_iou = _masked_iou(proposals, gt_boxes, is_crowd)
    no_crowd = jnp.max(crowd_iou, axis=1, initial=0.0) < 0.001

    overlaps = _masked_iou(proposals, gt_boxes, is_instance)  # [R, G]
    roi_iou_max = jnp.max(overlaps, axis=1, initial=0.0)

    pos_bool = (roi_iou_max >= pos_iou) & proposal_valid
    pos_keep = _random_keep(k_pos, pos_bool, p_cap)
    n_pos = pos_keep.sum()

    # negative budget: r*pos - pos with r = 1/ratio (model.py:518-519)
    n_neg = (jnp.floor(n_pos / config.ROI_POSITIVE_RATIO)
             .astype(jnp.int32) - n_pos)
    n_neg = jnp.where(n_pos > 0, n_neg, 0)  # model.py:516 requires pos>0
    n_neg = jnp.minimum(n_neg, t - p_cap)
    neg_bool = (roi_iou_max < pos_iou) & no_crowd & proposal_valid
    neg_keep = _random_keep(k_neg, neg_bool, n_neg)

    idx = jnp.arange(r)
    pos_packed = jnp.argsort(jnp.where(pos_keep, idx, r + idx))[:p_cap]
    neg_packed = jnp.argsort(jnp.where(neg_keep, idx, r + idx))[:t - p_cap]
    pos_valid = pos_keep[pos_packed]          # [p_cap]
    neg_valid = neg_keep[neg_packed]          # [t - p_cap]

    rois = jnp.concatenate(
        [proposals[pos_packed], proposals[neg_packed]], axis=0)
    valid = jnp.concatenate([pos_valid, neg_valid])
    positive = jnp.concatenate(
        [pos_valid, jnp.zeros_like(neg_valid)])
    rois = jnp.where(valid[:, None], rois, 0.0)

    # gt assignment for positives (model.py:476-480)
    assignment = jnp.argmax(
        jnp.where(is_instance[None, :], overlaps, -1.0), axis=1)  # [R]
    pos_assignment = assignment[pos_packed]
    class_ids = jnp.where(
        pos_valid, gt_class_ids[pos_assignment], 0).astype(jnp.int32)
    class_ids = jnp.concatenate(
        [class_ids, jnp.zeros((t - p_cap,), jnp.int32)])

    deltas = box_ops.box_deltas(proposals[pos_packed],
                                gt_boxes[pos_assignment])
    deltas = deltas / jnp.asarray(config.BBOX_STD_DEV, jnp.float32)
    deltas = jnp.where(pos_valid[:, None],
                       jnp.nan_to_num(deltas, nan=0.0, posinf=0.0,
                                      neginf=0.0), 0.0)
    deltas = jnp.concatenate([deltas, jnp.zeros((t - p_cap, 4))], axis=0)

    # Mask targets: crop each positive's assigned gt mask at the roi box
    # to MASK_SHAPE and round to 0/1 (model.py:494-507).
    crops = indexed_crop_and_resize(
        gt_masks[..., None], proposals[pos_packed],
        pos_assignment.astype(jnp.int32), mh)[..., 0]
    masks = jnp.round(crops)
    masks = jnp.where(pos_valid[:, None, None], masks, 0.0)
    masks = jnp.concatenate(
        [masks, jnp.zeros((t - p_cap, mh, mw))], axis=0)

    assignment_t = jnp.concatenate([
        jnp.where(pos_valid, pos_assignment, 0),
        jnp.zeros((t - p_cap,), pos_assignment.dtype)]).astype(jnp.int32)

    return MRNTargets(rois=rois, class_ids=class_ids, deltas=deltas,
                      masks=masks, valid=valid, positive=positive,
                      gt_assignment=assignment_t)


class CascadeTargets(NamedTuple):
    class_ids: jnp.ndarray   # [T] int32 (0 = background)
    deltas: jnp.ndarray      # [T, 4] float32 (positives only)
    valid: jnp.ndarray       # [T] bool: contributes to the class loss
    positive: jnp.ndarray    # [T] bool: contributes to the box loss
    assignment: jnp.ndarray  # [T] int32 matched gt index (pos only)


def cascade_targets(config: Config, rois: jnp.ndarray,
                    roi_valid: jnp.ndarray, gt_class_ids: jnp.ndarray,
                    gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                    pos_iou: float, std) -> CascadeTargets:
    """Single-image relabeling for a cascade stage > 0 (Cai &
    Vasconcelos 2018; no reference equivalent — the reference has no
    cascade).

    rois: [T, 4] normalized — the previous stage's refined boxes; no
    re-sampling happens past stage 0, every carried RoI is relabeled at
    the stage's higher IoU threshold. std: this stage's delta
    normalization (BBOX_STD_DEV / (stage + 1)).
    """
    is_crowd = (gt_class_ids < 0) & gt_valid
    is_instance = (gt_class_ids > 0) & gt_valid

    crowd_iou = _masked_iou(rois, gt_boxes, is_crowd)
    no_crowd = jnp.max(crowd_iou, axis=1, initial=0.0) < 0.001

    overlaps = _masked_iou(rois, gt_boxes, is_instance)        # [T, G]
    roi_iou_max = jnp.max(overlaps, axis=1, initial=0.0)
    assignment = jnp.argmax(
        jnp.where(is_instance[None, :], overlaps, -1.0), axis=1)

    positive = (roi_iou_max >= pos_iou) & roi_valid
    # negatives keep the crowd-exclusion rule of the stage-0 sampler
    valid = roi_valid & (positive | no_crowd)
    class_ids = jnp.where(
        positive, gt_class_ids[assignment], 0).astype(jnp.int32)

    deltas = box_ops.box_deltas(rois, gt_boxes[assignment])
    deltas = deltas / jnp.asarray(std, jnp.float32)
    deltas = jnp.where(positive[:, None],
                       jnp.nan_to_num(deltas, nan=0.0, posinf=0.0,
                                      neginf=0.0), 0.0)
    return CascadeTargets(class_ids=class_ids, deltas=deltas,
                          valid=valid, positive=positive,
                          assignment=jnp.where(
                              positive, assignment, 0).astype(jnp.int32))


def keypoint_targets(config: Config, rois: jnp.ndarray,
                     gt_assignment: jnp.ndarray, positive: jnp.ndarray,
                     gt_keypoints: jnp.ndarray):
    """Single-image keypoint heatmap targets (no reference equivalent —
    Mask R-CNN paper "Human Pose Estimation" / Detectron
    `keypoint_rcnn_heads.add_keypoint_losses` semantics).

    rois: [T, 4] normalized (y1, x1, y2, x2) sampled training RoIs
    (mrn_targets layout); gt_assignment/positive: [T] from MRNTargets;
    gt_keypoints: [G, K, 3] float32 (y, x, v) with y/x in CANVAS pixel
    coords and v the COCO visibility flag (0 unlabeled / 1 occluded /
    2 visible — both labeled states train, like Detectron).

    Returns (kp_pos [T, K] int32 flattened heatmap index,
    kp_valid [T, K] bool). A keypoint trains iff its RoI is positive,
    it is labeled (v > 0), and it lands strictly inside the RoI.
    """
    hh, hw = config.KEYPOINT_SHAPE
    h, w = config.IMAGE_SHAPE[:2]
    kp = gt_keypoints[gt_assignment]                    # [T, K, 3]
    y1, x1, y2, x2 = [rois[:, i] * s for i, s in
                      enumerate((h, w, h, w))]          # pixel coords
    bh = jnp.maximum(y2 - y1, 1e-6)[:, None]
    bw = jnp.maximum(x2 - x1, 1e-6)[:, None]
    fy = (kp[..., 0] - y1[:, None]) / bh                # [T, K] in [0,1)
    fx = (kp[..., 1] - x1[:, None]) / bw
    iy = jnp.floor(fy * hh).astype(jnp.int32)
    ix = jnp.floor(fx * hw).astype(jnp.int32)
    inside = (fy >= 0.0) & (fy < 1.0) & (fx >= 0.0) & (fx < 1.0)
    valid = (positive[:, None] & (kp[..., 2] > 0) & inside
             & ((y2 - y1) > 0)[:, None] & ((x2 - x1) > 0)[:, None])
    pos = jnp.clip(iy, 0, hh - 1) * hw + jnp.clip(ix, 0, hw - 1)
    return jnp.where(valid, pos, 0), valid
