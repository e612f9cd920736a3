"""Target-sampler tests against numpy oracles of the reference rules."""

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.train.targets import mrn_targets, rpn_targets


def make_gt(cfg, rng, n_real, n_crowd=0):
    g = cfg.MAX_GT_INSTANCES
    d = cfg.IMAGE_MAX_DIM
    cls = np.zeros(g, np.int32)
    boxes = np.zeros((g, 4), np.float32)
    valid = np.zeros(g, bool)
    for i in range(n_real + n_crowd):
        y1 = rng.uniform(0, d * 0.6)
        x1 = rng.uniform(0, d * 0.6)
        h = rng.uniform(d * 0.1, d * 0.4)
        w = rng.uniform(d * 0.1, d * 0.4)
        boxes[i] = [y1, x1, min(y1 + h, d), min(x1 + w, d)]
        cls[i] = rng.randint(1, cfg.NUM_CLASSES)
        if i >= n_real:
            cls[i] = -cls[i]  # crowd
        valid[i] = True
    return cls, boxes, valid


def test_rpn_targets_rules(rng):
    cfg = TinyConfig()
    from maskrcnn_tpu.ops.anchors import config_anchors
    anchors = config_anchors(cfg)
    cls, boxes, valid = make_gt(cfg, rng, 3)

    out = jax.jit(lambda k: rpn_targets(
        cfg, k, jnp.asarray(anchors), jnp.asarray(cls), jnp.asarray(boxes),
        jnp.asarray(valid)))(jax.random.PRNGKey(0))
    match = np.asarray(out.rpn_match)
    bbox = np.asarray(out.rpn_bbox)

    t = cfg.RPN_TRAIN_ANCHORS_PER_IMAGE
    n_pos = (match == 1).sum()
    n_neg = (match == -1).sum()
    assert 0 < n_pos <= t // 2
    assert n_pos + n_neg <= t
    # every real gt has at least one positive anchor (forced match)
    from maskrcnn_tpu.ops.boxes import box_iou
    iou = np.asarray(box_iou(jnp.asarray(anchors), jnp.asarray(boxes[:3])))
    for g in range(3):
        best = iou[:, g].max()
        # the best anchor for this gt is positive unless subsampled out
        if n_pos < t // 2:
            assert match[iou[:, g].argmax()] == 1, f"gt {g} best {best}"
    # packed deltas: first n_pos rows nonzero-ish, rest exactly 0
    assert (bbox[n_pos:] == 0).all()
    # positive rows: refine(anchor, delta*std) == gt box of its argmax
    pos_idx = np.sort(np.where(match == 1)[0])
    from maskrcnn_tpu.ops.boxes import refine_boxes
    std = np.array(cfg.RPN_BBOX_STD_DEV, np.float32)
    rec = np.asarray(refine_boxes(jnp.asarray(anchors[pos_idx]),
                                  jnp.asarray(bbox[:n_pos] * std)))
    gt_assign = iou[pos_idx].argmax(1)
    np.testing.assert_allclose(rec, boxes[:3][gt_assign], rtol=1e-3,
                               atol=0.5)


def test_rpn_targets_crowd_exclusion(rng):
    cfg = TinyConfig()
    from maskrcnn_tpu.ops.anchors import config_anchors
    anchors = config_anchors(cfg)
    cls, boxes, valid = make_gt(cfg, rng, 1, n_crowd=1)
    out = jax.jit(lambda k: rpn_targets(
        cfg, k, jnp.asarray(anchors), jnp.asarray(cls), jnp.asarray(boxes),
        jnp.asarray(valid)))(jax.random.PRNGKey(1))
    match = np.asarray(out.rpn_match)
    # anchors overlapping the crowd box must not be negative
    from maskrcnn_tpu.ops.boxes import box_iou
    crowd_iou = np.asarray(
        box_iou(jnp.asarray(anchors), jnp.asarray(boxes[1:2])))[:, 0]
    overlapping = crowd_iou >= 0.001
    assert not (match[overlapping] == -1).any()


def test_mrn_targets_layout(rng):
    cfg = TinyConfig()
    g = cfg.MAX_GT_INSTANCES
    d = cfg.IMAGE_MAX_DIM
    cls, boxes, valid = make_gt(cfg, rng, 4)
    boxes_norm = boxes / d
    masks = (rng.rand(g, d, d) > 0.4).astype(np.uint8)

    r = cfg.RPN_NMS_MAX_ROIS_NUM
    # proposals: half jittered copies of gt (positives), half far away
    props = np.zeros((r, 4), np.float32)
    pvalid = np.zeros(r, bool)
    for i in range(r // 2):
        gt = boxes_norm[i % 4]
        jitter = rng.uniform(-0.01, 0.01, 4)
        props[i] = np.clip(gt + jitter, 0, 1)
        pvalid[i] = True
    for i in range(r // 2, r - 4):
        y = rng.uniform(0.7, 0.9)
        x = rng.uniform(0.7, 0.9)
        props[i] = [y, x, min(y + 0.05, 1), min(x + 0.05, 1)]
        pvalid[i] = True

    out = jax.jit(lambda k: mrn_targets(
        cfg, k, jnp.asarray(props), jnp.asarray(pvalid), jnp.asarray(cls),
        jnp.asarray(boxes_norm), jnp.asarray(masks),
        jnp.asarray(valid)))(jax.random.PRNGKey(2))

    t = cfg.TRAIN_ROIS_PER_IMAGE
    p_cap = int(t * cfg.ROI_POSITIVE_RATIO)
    pos = np.asarray(out.positive)
    val = np.asarray(out.valid)
    cids = np.asarray(out.class_ids)
    n_pos = pos.sum()
    assert 0 < n_pos <= p_cap
    # positives first, valid negatives after slot p_cap
    assert not pos[p_cap:].any()
    # 1:3-ish ratio (model.py:518-519)
    n_neg = (val & ~pos).sum()
    expected_neg = min(int(n_pos / cfg.ROI_POSITIVE_RATIO) - n_pos,
                       t - p_cap)
    assert n_neg == expected_neg, (n_neg, expected_neg)
    # class ids: positive rows real classes, negatives 0
    assert (cids[pos] > 0).all()
    assert (cids[~pos] == 0).all()
    # mask targets binary
    m = np.asarray(out.masks)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m[pos].sum() > 0
