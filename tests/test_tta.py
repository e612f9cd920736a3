"""Horizontal-flip test-time augmentation (config.TTA_HFLIP).

Covers the three pieces separately — the coordinate mirrors, the
NMS-merge of two detection sets, and the end-to-end predict_step branch
— then checks the integration property that every TTA detection comes
from the union of the two single-pass detection sets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.detection.pipeline import (Detections, detect_boxes,
                                             flip_boxes, flip_windows,
                                             merge_detections,
                                             predict_step)
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_flip_boxes_roundtrip(rng):
    w = 128
    y1 = rng.uniform(0, 60, (16,))
    x1 = rng.uniform(0, 60, (16,))
    boxes = np.stack([y1, x1, y1 + rng.uniform(1, 60, 16),
                      x1 + rng.uniform(1, 60, 16)],
                     axis=-1).astype(np.float32)
    flipped = np.asarray(flip_boxes(jnp.asarray(boxes), w))
    # mirror of [x1, x2) about width w is [w-x2, w-x1); y untouched
    np.testing.assert_allclose(flipped[:, 1], w - boxes[:, 3])
    np.testing.assert_allclose(flipped[:, 3], w - boxes[:, 1])
    np.testing.assert_allclose(flipped[:, 0], boxes[:, 0])
    np.testing.assert_allclose(flipped[:, 2], boxes[:, 2])
    # involution
    back = np.asarray(flip_boxes(jnp.asarray(flipped), w))
    np.testing.assert_allclose(back, boxes, atol=1e-5)
    # x1 < x2 is preserved
    assert (flipped[:, 3] > flipped[:, 1]).all()


def test_flip_windows_centered_pad():
    # a centered window stays (nearly) fixed; an offset one mirrors
    w = 128
    win = jnp.asarray([[10.0, 14.0, 118.0, 114.0],
                       [0.0, 0.0, 128.0, 100.0]])
    out = np.asarray(flip_windows(win, w))
    np.testing.assert_allclose(out[0], [10.0, 14.0, 118.0, 114.0])
    np.testing.assert_allclose(out[1], [0.0, 28.0, 128.0, 128.0])


def _dets(boxes, scores, class_ids, valid):
    pad = lambda a: jnp.asarray(np.asarray(a)[None])  # batch of 1
    return Detections(class_ids=pad(np.asarray(class_ids, np.int32)),
                      scores=pad(np.asarray(scores, np.float32)),
                      boxes=pad(np.asarray(boxes, np.float32)),
                      valid=pad(np.asarray(valid, bool)))


def test_merge_fuses_matched_pair_coordinates():
    """Matched same-class cross-pass boxes must average their
    coordinates (score-weighted), not keep the winner's verbatim
    (VERDICT r4 #1: winner-take-all merge cost 5.2 bbox AP75)."""
    cfg = TinyConfig()
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    # same object seen by the two passes with 4px localization jitter
    a = _dets([[20, 20, 60, 60]] + [z] * (d - 1),
              [0.9] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    b = _dets([[24, 24, 64, 64]] + [z] * (d - 1),
              [0.6] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    m = merge_detections(cfg, a, b)
    valid = np.asarray(m.valid)[0]
    assert valid.sum() == 1  # fused pair dedups to one box
    got = np.asarray(m.boxes)[0][valid][0]
    want = (0.9 * np.asarray([20, 20, 60, 60])
            + 0.6 * np.asarray([24, 24, 64, 64])) / 1.5
    np.testing.assert_allclose(got, want, atol=1e-4)
    # winner's score is kept
    assert abs(np.asarray(m.scores)[0][valid][0] - 0.9) < 1e-6

    # TTA_FUSION_IOU=0 restores the round-4 winner-take-all merge
    m0 = merge_detections(cfg.replace(TTA_FUSION_IOU=0.0), a, b)
    v0 = np.asarray(m0.valid)[0]
    np.testing.assert_allclose(np.asarray(m0.boxes)[0][v0][0],
                               [20, 20, 60, 60])


def test_merge_fusion_identity_when_passes_agree():
    """When both passes emit identical boxes the fusion is the identity
    and the merge degrades to exactly the plain per-class NMS."""
    cfg = TinyConfig()
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    bx = [[10, 10, 40, 40], [60, 60, 90, 90]]
    a = _dets(bx + [z] * (d - 2), [0.9, 0.7] + [0.0] * (d - 2),
              [1, 2] + [0] * (d - 2), [True, True] + [False] * (d - 2))
    m = merge_detections(cfg, a, a)
    valid = np.asarray(m.valid)[0]
    assert valid.sum() == 2
    got = sorted(np.asarray(m.boxes)[0][valid].tolist())
    np.testing.assert_allclose(got, sorted([list(map(float, b))
                                            for b in bx]))


def test_merge_fusion_singleton_keeps_own_coords():
    """A detection found by only one pass keeps its coordinates exactly
    (self-weight s_i cancels)."""
    cfg = TinyConfig()
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    a = _dets([[20, 20, 60, 60]] + [z] * (d - 1),
              [0.37] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    empty = _dets([z] * d, [0.0] * d, [0] * d, [False] * d)
    m = merge_detections(cfg, a, empty)
    valid = np.asarray(m.valid)[0]
    assert valid.sum() == 1
    np.testing.assert_allclose(np.asarray(m.boxes)[0][valid][0],
                               [20, 20, 60, 60])


def test_merge_fusion_never_crosses_classes():
    """Overlapping boxes of different classes must not fuse."""
    cfg = TinyConfig()
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    a = _dets([[20, 20, 60, 60]] + [z] * (d - 1),
              [0.9] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    b = _dets([[22, 22, 62, 62]] + [z] * (d - 1),
              [0.8] + [0.0] * (d - 1),
              [2] + [0] * (d - 1), [True] + [False] * (d - 1))
    m = merge_detections(cfg, a, b)
    valid = np.asarray(m.valid)[0]
    assert valid.sum() == 2
    boxes = np.asarray(m.boxes)[0][valid]
    scores = np.asarray(m.scores)[0][valid]
    np.testing.assert_allclose(boxes[np.argmax(scores)], [20, 20, 60, 60])
    np.testing.assert_allclose(boxes[np.argmin(scores)], [22, 22, 62, 62])


def test_merge_detections_dedup_and_order():
    cfg = TinyConfig()
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    # set A: one strong box of class 1, one of class 2 elsewhere
    a = _dets([[10, 10, 40, 40], [60, 60, 90, 90]] + [z] * (d - 2),
              [0.9, 0.7] + [0.0] * (d - 2),
              [1, 2] + [0] * (d - 2),
              [True, True] + [False] * (d - 2))
    # set B: the SAME class-1 box at lower score (must be suppressed),
    # plus a new class-1 box far away (must survive), plus an invalid
    # high-score row (must be ignored)
    b = _dets([[10, 10, 40, 40], [100, 100, 120, 120],
               [0, 0, 128, 128]] + [z] * (d - 3),
              [0.8, 0.6, 0.99] + [0.0] * (d - 3),
              [1, 1, 3] + [0] * (d - 3),
              [True, True, False] + [False] * (d - 3))
    m = merge_detections(cfg, a, b)
    scores = np.asarray(m.scores)[0]
    class_ids = np.asarray(m.class_ids)[0]
    valid = np.asarray(m.valid)[0]
    kept = sorted(zip(scores[valid].tolist(), class_ids[valid].tolist()),
                  reverse=True)
    want = [(0.9, 1), (0.7, 2), (0.6, 1)]
    assert len(kept) == len(want)
    for (gs, gc), (ws, wc) in zip(kept, want):
        assert abs(gs - ws) < 1e-6 and gc == wc
    # survivors are score-sorted in the slot prefix
    assert (np.diff(scores[valid]) <= 1e-6).all()
    # the duplicate and the invalid row are gone
    assert np.abs(scores[valid] - 0.8).min() > 1e-3
    assert np.abs(scores[valid] - 0.99).min() > 1e-3


def test_merge_soft_nms_retains_decayed_duplicates():
    """With DETECTION_SOFT_NMS_SIGMA > 0 the TTA merge must decay
    same-class duplicates instead of hard-suppressing them (advisor r3:
    a hard-NMS merge silently undid per-pass soft-NMS retention)."""
    cfg = TinyConfig(DETECTION_SOFT_NMS_SIGMA=0.5,
                     DETECTION_MIN_CONFIDENCE=0.0)
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    # two heavily-overlapping class-1 boxes, one per pass: hard NMS at
    # the 0.3 threshold would drop the weaker; soft-NMS keeps it with a
    # decayed score
    a = _dets([[20, 20, 70, 70]] + [z] * (d - 1),
              [0.9] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    b = _dets([[22, 22, 72, 72]] + [z] * (d - 1),
              [0.8] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    hard = merge_detections(cfg.replace(DETECTION_SOFT_NMS_SIGMA=0.0),
                            a, b)
    soft = merge_detections(cfg, a, b)
    assert np.asarray(hard.valid)[0].sum() == 1  # hard merge suppresses
    svalid = np.asarray(soft.valid)[0]
    sscores = np.asarray(soft.scores)[0]
    assert svalid.sum() == 2                     # soft merge retains
    # the winner keeps its exact score; the duplicate is decayed
    assert abs(sscores[svalid].max() - 0.9) < 1e-6
    low = sscores[svalid].min()
    assert 0.0 < low < 0.8


def test_merge_keeps_overlapping_other_class():
    cfg = TinyConfig()
    d = cfg.DETECTION_MAX_INSTANCES
    z = [0.0, 0.0, 0.0, 0.0]
    box = [20, 20, 70, 70]
    a = _dets([box] + [z] * (d - 1), [0.9] + [0.0] * (d - 1),
              [1] + [0] * (d - 1), [True] + [False] * (d - 1))
    b = _dets([box] + [z] * (d - 1), [0.8] + [0.0] * (d - 1),
              [2] + [0] * (d - 1), [True] + [False] * (d - 1))
    m = merge_detections(cfg, a, b)
    valid = np.asarray(m.valid)[0]
    assert valid.sum() == 2  # per-class NMS: same box, different class


@pytest.mark.slow
def test_predict_step_tta_smoke_and_union(rng):
    cfg = TinyConfig(TTA_HFLIP=True)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    d = cfg.IMAGE_MAX_DIM
    images = (rng.rand(2, d, d, 3) * 255).astype(np.uint8)
    windows = np.array([[0, 0, d, d], [4, 4, d - 4, d - 4]], np.float32)

    out = predict_step(model, params, jnp.asarray(images),
                       jnp.asarray(windows))
    assert out["class_ids"].shape == (2, cfg.DETECTION_MAX_INSTANCES)
    assert out["masks_packed"].shape == (2, cfg.DETECTION_MAX_INSTANCES,
                                         d, d // 8)
    valid = np.asarray(out["valid"])
    masks = np.unpackbits(np.asarray(out["masks_packed"]),
                          axis=-1).astype(bool)
    assert not masks[0][~valid[0]].any()

    # every TTA detection must come from the union of the two passes:
    # its score from one pass verbatim, its (fused) box inside the
    # coordinate envelope of that pass-union (box fusion averages
    # matched boxes, so each coordinate is a convex combination; +-1
    # slack for the post-merge rounding). Union computed with
    # round_boxes=False to match the TTA-internal passes.
    ji = jnp.asarray(images)
    jw = jnp.asarray(windows)
    det_a = jax.jit(lambda p, im, w: detect_boxes(
        model, p, im, w, round_boxes=False)[1])(params, ji, jw)
    det_b = jax.jit(lambda p, im, w: detect_boxes(
        model, p, im, w, round_boxes=False)[1])(
        params, ji[:, :, ::-1], flip_windows(jw, d))
    union_boxes = np.concatenate(
        [np.asarray(det_a.boxes),
         np.asarray(flip_boxes(det_b.boxes, d))], axis=1)
    union_scores = np.concatenate(
        [np.asarray(det_a.scores), np.asarray(det_b.scores)], axis=1)
    union_valid = np.concatenate(
        [np.asarray(det_a.valid), np.asarray(det_b.valid)], axis=1)
    for i in range(2):
        lo = union_boxes[i][union_valid[i]].min(axis=0) - 1.0
        hi = union_boxes[i][union_valid[i]].max(axis=0) + 1.0
        for j in np.where(valid[i])[0]:
            score = np.asarray(out["scores"])[i, j]
            box = np.asarray(out["boxes"])[i, j]
            cand = np.where(union_valid[i]
                            & (np.abs(union_scores[i] - score) < 1e-3))[0]
            assert cand.size, f"TTA score {score} not in either pass"
            assert (box >= lo).all() and (box <= hi).all(), \
                "TTA fused box outside the pass-union envelope"
