"""Golden-diff the training target samplers against the reference's own.

The reference's `rpn_samples` (data.py:449-591, host numpy) and
`mrn_samples` (model.py:396-576, torch + its compiled crop kernel) are
imported via tests/reference_oracle.py and run on the SAME scenes as our
on-device `train.targets.rpn_targets` / `mrn_targets`.

Both reference samplers randomly subsample when candidates exceed their
caps (np.random.choice / torch.randperm), which no cross-framework RNG
can reproduce — so the scenes are constructed in the DETERMINISTIC
regime where the caps don't bind:

* rpn: the anchor cap is set to the full anchor count, so `extra <= 0`
  on both the positive and negative branches and no np.random.choice
  fires — the match labels and the packed positive deltas are then a
  pure function of the match rules (crowd exclusion, forced per-gt
  positive, the 0.3/0.7 thresholds) and the delta formula.
* mrn: positive/negative candidates are crafted to fit under the caps,
  so torch.randperm only permutes a fully-kept SET — comparisons sort
  positives/negatives by roi coordinates on both sides.

This covers exactly the seams the per-kernel golden tests
(test_geometry_golden.py) cannot: column removal vs masking for crowds,
argmax tie order after crowd compaction, the forced-positive rule, the
positive-delta packing order, the negative-budget formula, and the
gt-mask crop -> round composition.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from maskrcnn_tpu.config import CocoConfig
from maskrcnn_tpu.ops.anchors import config_anchors
from maskrcnn_tpu.train.targets import mrn_targets, rpn_targets
from tests.reference_oracle import load

pytestmark = pytest.mark.slow

DIM = 256


@pytest.fixture(scope="module")
def ref():
    r = load()
    if r is None:
        pytest.skip("reference tree or C toolchain unavailable")
    return r


def _ref_train_config(ref, **overrides):
    class OracleTrainConfig(ref.config.CocoConfig):
        GPU_COUNT = 0
        IMAGE_MIN_DIM = DIM
        IMAGE_MAX_DIM = DIM
    for k, v in overrides.items():
        setattr(OracleTrainConfig, k, v)
    return OracleTrainConfig()


def _scene(rng, n_instance, n_crowd):
    """Random pixel-coord gt boxes + class ids (crowds negative)."""
    boxes = []
    for _ in range(n_instance + n_crowd):
        y1, x1 = rng.randint(0, DIM - 40, 2)
        h, w = rng.randint(16, 120, 2)
        boxes.append([y1, x1, min(y1 + h, DIM), min(x1 + w, DIM)])
    boxes = np.asarray(boxes, np.float64)
    ids = rng.randint(1, 81, n_instance + n_crowd)
    ids[n_instance:] *= -1  # crowds last, negative
    return boxes, ids.astype(np.int32)


@pytest.mark.parametrize("n_crowd", [0, 2])
def test_rpn_sampler_matches_reference(ref, n_crowd):
    rng = np.random.RandomState(7 + n_crowd)
    anchors = config_anchors(
        CocoConfig(IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM))
    a = anchors.shape[0]

    gt_boxes, gt_ids = _scene(rng, n_instance=6, n_crowd=n_crowd)

    # Deterministic regime: cap = A, so no subsample choice fires.
    ref_cfg = _ref_train_config(ref, RPN_TRAIN_ANCHORS_PER_IMAGE=a)
    ref_match, ref_bbox = ref.data.rpn_samples(
        anchors.astype(np.float64), gt_ids.copy(), gt_boxes.copy(),
        ref_cfg)

    cfg = CocoConfig(IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM,
                     RPN_TRAIN_ANCHORS_PER_IMAGE=a)
    g = len(gt_ids)
    out = jax.jit(lambda k, gb, gi: rpn_targets(
        cfg, k, jnp.asarray(anchors), gi, gb,
        jnp.ones((g,), jnp.bool_)))(
            jax.random.PRNGKey(0),
            jnp.asarray(gt_boxes, jnp.float32),
            jnp.asarray(gt_ids))

    np.testing.assert_array_equal(np.asarray(out.rpn_match),
                                  ref_match.astype(np.int32))
    n_pos = int((ref_match == 1).sum())
    assert n_pos > 0
    np.testing.assert_allclose(np.asarray(out.rpn_bbox)[:n_pos],
                               ref_bbox[:n_pos], atol=2e-5)
    # rows past the positives are zero padding on both sides
    assert np.all(np.asarray(out.rpn_bbox)[n_pos:] == 0)
    assert np.all(ref_bbox[n_pos:] == 0)


def _mrn_scene(rng, n_pos, n_neg, n_crowd_hit, n_gt=4, n_crowd=1):
    """Normalized-coords scene where both samplers keep every candidate.

    Returns (proposals, gt_ids, gt_boxes, gt_masks) with `n_pos`
    proposals jittered onto gt (IoU >= 0.5), `n_neg` placed far away
    (IoU < 0.5 with every gt, no crowd contact) and `n_crowd_hit`
    low-IoU proposals overlapping the crowd box (excluded from
    negatives by both samplers).
    """
    # gt instances in the left half, crowd box in the bottom-right
    gt_boxes = []
    for i in range(n_gt):
        y1 = 0.05 + 0.2 * i
        gt_boxes.append([y1, 0.05, y1 + 0.15, 0.35])
    crowd = [0.75, 0.55, 0.99, 0.99]
    gt_boxes = np.asarray(gt_boxes + [crowd] * n_crowd, np.float32)
    gt_ids = np.concatenate([rng.randint(1, 81, n_gt),
                             -rng.randint(1, 81, n_crowd)]).astype(np.int32)

    props = []
    for i in range(n_pos):
        base = gt_boxes[i % n_gt]
        jit = rng.uniform(-0.01, 0.01, 4)
        props.append(np.clip(base + jit, 0, 1))
    for _ in range(n_neg):
        # top-right corner: away from instances AND the crowd
        y1 = rng.uniform(0.02, 0.2)
        x1 = rng.uniform(0.55, 0.8)
        props.append([y1, x1, y1 + rng.uniform(0.05, 0.15),
                      x1 + rng.uniform(0.05, 0.15)])
    for _ in range(n_crowd_hit):
        props.append([0.78 + rng.uniform(0, 0.02),
                      0.6 + rng.uniform(0, 0.02), 0.9, 0.8])
    proposals = np.asarray(props, np.float32)

    # Smooth float masks: bilinear samples then land away from the 0.5
    # round boundary, so round() is fp-robust across frameworks.
    gt_masks = rng.rand(len(gt_boxes), DIM, DIM).astype(np.float32)
    return proposals, gt_ids, gt_boxes, gt_masks


def test_mrn_sampler_matches_reference(ref):
    rng = np.random.RandomState(3)
    n_pos, n_neg, n_crowd_hit = 6, 10, 2
    proposals, gt_ids, gt_boxes, gt_masks = _mrn_scene(
        rng, n_pos, n_neg, n_crowd_hit)

    ref_cfg = _ref_train_config(ref)
    torch.manual_seed(0)
    ref_rois, ref_ids, ref_deltas, ref_masks = ref.model.mrn_samples(
        torch.from_numpy(proposals).unsqueeze(0),
        torch.from_numpy(gt_ids).unsqueeze(0),
        torch.from_numpy(gt_boxes).unsqueeze(0),
        torch.from_numpy(gt_masks).unsqueeze(0), ref_cfg)
    ref_rois = ref_rois.numpy()
    ref_ids = ref_ids.numpy()
    ref_deltas = ref_deltas.numpy()
    ref_masks = ref_masks.numpy()

    cfg = CocoConfig(IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM)
    r = proposals.shape[0]
    g = len(gt_ids)
    out = jax.jit(lambda k: mrn_targets(
        cfg, k, jnp.asarray(proposals), jnp.ones((r,), jnp.bool_),
        jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
        jnp.asarray(gt_masks), jnp.ones((g,), jnp.bool_)))(
            jax.random.PRNGKey(1))

    got_pos = np.asarray(out.positive)
    got_valid = np.asarray(out.valid)

    # Both kept every candidate (deterministic regime)
    ref_n_pos = int((ref_ids > 0).sum())
    assert ref_n_pos == n_pos
    assert int(got_pos.sum()) == n_pos
    assert int(got_valid.sum()) == ref_rois.shape[0]

    # --- positives: match by sorted roi coordinates ---
    def order(rois):
        return np.lexsort(rois.T[::-1])

    ref_pos_sel = np.arange(ref_n_pos)  # reference packs positives first
    got_pos_idx = np.where(got_pos)[0]
    ref_o = ref_pos_sel[order(ref_rois[ref_pos_sel])]
    got_o = got_pos_idx[order(np.asarray(out.rois)[got_pos_idx])]

    np.testing.assert_allclose(np.asarray(out.rois)[got_o],
                               ref_rois[ref_o], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.class_ids)[got_o],
                                  ref_ids[ref_o])
    np.testing.assert_allclose(np.asarray(out.deltas)[got_o],
                               ref_deltas[ref_o], atol=1e-5)
    got_masks = np.asarray(out.masks)[got_o]
    want_masks = ref_masks[ref_o]
    # round() composed over two bit-different bilinear kernels: allow
    # isolated boundary-pixel flips, none expected with smooth masks
    disagree = np.abs(got_masks - want_masks).mean(axis=(1, 2))
    assert disagree.max() <= 0.005, disagree

    # --- negatives: same SET of rois, zero targets ---
    ref_neg = ref_rois[ref_n_pos:]
    got_neg_idx = np.where(got_valid & ~got_pos)[0]
    assert len(got_neg_idx) == len(ref_neg) == n_neg
    np.testing.assert_allclose(
        np.asarray(out.rois)[got_neg_idx][order(
            np.asarray(out.rois)[got_neg_idx])],
        ref_neg[order(ref_neg)], atol=1e-6)
    assert np.all(np.asarray(out.class_ids)[got_neg_idx] == 0)
    assert np.all(ref_ids[ref_n_pos:] == 0)


def test_mrn_sampler_binary_masks(ref):
    """Same comparison with REAL binary gt masks (the production input):
    rounding can tie at exactly 0.5 on box-aligned edges, so the mask
    check is a disagreement bound instead of exact equality."""
    rng = np.random.RandomState(5)
    proposals, gt_ids, gt_boxes, gt_masks = _mrn_scene(rng, 4, 8, 0)
    # binary masks: filled boxes matching each gt
    gt_masks = np.zeros_like(gt_masks)
    for i, b in enumerate(gt_boxes):
        y1, x1, y2, x2 = (b * DIM).astype(int)
        gt_masks[i, y1:y2, x1:x2] = 1.0

    ref_cfg = _ref_train_config(ref)
    torch.manual_seed(0)
    ref_rois, ref_ids, _, ref_masks = ref.model.mrn_samples(
        torch.from_numpy(proposals).unsqueeze(0),
        torch.from_numpy(gt_ids).unsqueeze(0),
        torch.from_numpy(gt_boxes).unsqueeze(0),
        torch.from_numpy(gt_masks).unsqueeze(0), ref_cfg)
    ref_rois = ref_rois.numpy()
    ref_n_pos = int((ref_ids.numpy() > 0).sum())

    cfg = CocoConfig(IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM)
    r, g = proposals.shape[0], len(gt_ids)
    out = jax.jit(lambda k: mrn_targets(
        cfg, k, jnp.asarray(proposals), jnp.ones((r,), jnp.bool_),
        jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
        jnp.asarray(gt_masks), jnp.ones((g,), jnp.bool_)))(
            jax.random.PRNGKey(2))

    def order(rois):
        return np.lexsort(rois.T[::-1])

    got_pos_idx = np.where(np.asarray(out.positive))[0]
    assert len(got_pos_idx) == ref_n_pos
    ref_o = order(ref_rois[:ref_n_pos])
    got_o = got_pos_idx[order(np.asarray(out.rois)[got_pos_idx])]
    disagree = np.abs(np.asarray(out.masks)[got_o]
                      - ref_masks.numpy()[ref_o]).mean(axis=(1, 2))
    assert disagree.max() < 0.01, disagree
