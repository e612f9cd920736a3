"""NMS tests against a numpy oracle of the reference kernel.

The oracle reproduces nms_cpu.cpp:11-70 exactly: +1 area convention,
score-descending order, suppression at iou >= threshold.
"""

import numpy as np
import jax.numpy as jnp

from maskrcnn_tpu.ops import nms as N


def np_nms(dets, thr):
    """Oracle of nms_cpu.cpp: returns kept original indices (any order)."""
    y1, x1, y2, x2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(dets), bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            yy1 = max(y1[i], y1[j])
            xx1 = max(x1[i], x1[j])
            yy2 = min(y2[i], y2[j])
            xx2 = min(x2[i], x2[j])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            ovr = inter / (areas[i] + areas[j] - inter)
            if ovr >= thr:
                suppressed[j] = True
    return np.where(~suppressed)[0]


def rand_dets(rng, n, size=200.0):
    y1 = rng.uniform(0, size, n)
    x1 = rng.uniform(0, size, n)
    h = rng.uniform(5, size / 2, n)
    w = rng.uniform(5, size / 2, n)
    s = rng.uniform(0, 1, n)
    return np.stack([y1, x1, y1 + h, x1 + w, s], 1).astype(np.float32)


def test_nms_mask_matches_oracle(rng):
    for trial in range(5):
        dets = rand_dets(rng, 64)
        thr = [0.3, 0.5, 0.7][trial % 3]
        expected = set(np_nms(dets, thr).tolist())

        order = np.argsort(-dets[:, 4], kind="stable")
        sboxes = jnp.asarray(dets[order, :4])
        keep = np.asarray(
            N.nms_mask(sboxes, jnp.ones(len(dets), bool), thr))
        got = set(order[keep].tolist())
        assert got == expected


def test_nms_respects_valid_mask(rng):
    dets = rand_dets(rng, 16)
    order = np.argsort(-dets[:, 4], kind="stable")
    valid = np.ones(16, bool)
    valid[8:] = False  # last 8 (lowest scores) are padding
    keep = np.asarray(
        N.nms_mask(jnp.asarray(dets[order, :4]), jnp.asarray(valid), 0.5))
    assert not keep[8:].any()
    #

    expected = set(np_nms(dets[order[:8]], 0.5).tolist())
    assert set(np.where(keep[:8])[0].tolist()) == expected


def test_nms_topk_orders_by_score(rng):
    dets = rand_dets(rng, 32)
    boxes, scores, valid, idx = N.nms_topk(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
        jnp.ones(32, bool), 0.5, 10)
    scores = np.asarray(scores)
    valid = np.asarray(valid)
    kept = scores[valid]
    assert (np.diff(kept) <= 1e-6).all()
    # indices must point at the original rows
    idx = np.asarray(idx)
    for row, i in enumerate(idx):
        if valid[row]:
            np.testing.assert_allclose(
                np.asarray(boxes)[row], dets[i, :4], rtol=1e-6)


def test_multiclass_nms_equals_per_class_loop(rng):
    """Class-offset trick == reference per-class loop (model.py:1454-1475)."""
    n = 48
    dets = rand_dets(rng, n)
    dets[:, :4] = np.round(dets[:, :4])  # reference rounds first
    classes = rng.randint(1, 4, n)

    order = np.argsort(-dets[:, 4], kind="stable")
    sdets = dets[order]
    sclasses = classes[order]

    keep = np.asarray(N.multiclass_nms_mask(
        jnp.asarray(sdets[:, :4]), jnp.asarray(sclasses),
        jnp.ones(n, bool), 0.3, coord_span=500.0))

    expected = set()
    for c in np.unique(sclasses):
        ix = np.where(sclasses == c)[0]
        kept_c = np_nms(sdets[ix], 0.3)
        expected |= set(ix[kept_c].tolist())
    assert set(np.where(keep)[0].tolist()) == expected


def np_soft_nms(boxes, scores, valid, sigma, iters):
    """Oracle of the Bodla et al. gaussian Soft-NMS select-and-decay
    loop (same +1-area IoU as np_nms)."""
    n = len(boxes)
    scores = scores.astype(np.float64).copy()
    y1, x1, y2, x2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    done = np.zeros(n, bool)
    final = np.zeros(n)
    for _ in range(iters):
        cand = np.where(done | ~valid, -np.inf, scores)
        i = int(np.argmax(cand))
        if not np.isfinite(cand[i]):
            break
        final[i] = scores[i]
        done[i] = True
        yy1 = np.maximum(y1[i], y1)
        xx1 = np.maximum(x1[i], x1)
        yy2 = np.minimum(y2[i], y2)
        xx2 = np.minimum(x2[i], x2)
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        iou = inter / (areas[i] + areas - inter)
        scores = np.where(done, scores,
                          scores * np.exp(-(iou ** 2) / sigma))
    return final


def test_soft_nms_matches_oracle(rng):
    n = 64
    dets = rand_dets(rng, n)
    valid = np.ones(n, bool)
    valid[-5:] = False
    for sigma, iters in ((0.5, n), (0.5, 10), (0.1, 20)):
        want = np_soft_nms(dets[:, :4], dets[:, 4], valid, sigma, iters)
        got = np.asarray(N.soft_nms_scores(
            jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
            jnp.asarray(valid), sigma, iters))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
        # invalid rows never get a score
        assert (got[~valid] == 0).all()


def test_soft_nms_isolated_boxes_keep_scores(rng):
    # far-apart boxes never decay each other: soft-NMS returns the
    # input scores for every selected box
    n = 8
    boxes = np.stack([np.arange(n) * 100.0, np.arange(n) * 100.0,
                      np.arange(n) * 100.0 + 10,
                      np.arange(n) * 100.0 + 10], axis=-1)
    scores = rng.rand(n).astype(np.float32)
    got = np.asarray(N.soft_nms_scores(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(n, bool), 0.5, n))
    np.testing.assert_allclose(got, scores, rtol=1e-6)
