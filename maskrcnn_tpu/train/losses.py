"""The five-task Mask R-CNN loss (reference: model.py:652-718, 802-845,
922-953; summed at model.py:1623-1629).

All losses are masked means over fixed-shape tensors: where the reference
gathers dynamic index lists (torch.nonzero), we weight by boolean masks —
identical expectation, jit-compatible. Empty selections return 0 like the
reference's empty-tensor branches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def smooth_l1(diff: jnp.ndarray) -> jnp.ndarray:
    """F.smooth_l1_loss elementwise core (beta=1)."""
    a = jnp.abs(diff)
    return jnp.where(a < 1.0, 0.5 * a * a, a - 0.5)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sum(values * mask)
    den = jnp.sum(mask)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def rpn_class_loss(rpn_match: jnp.ndarray,
                   rpn_logits: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy over sampled (+-1) anchors (model.py:652-686).

    rpn_match: [..., A] int32; rpn_logits: [..., A, 2].
    """
    target = (rpn_match == 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(rpn_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, (rpn_match != 0).astype(jnp.float32))


def rpn_box_loss(target_bbox: jnp.ndarray, rpn_match: jnp.ndarray,
                 rpn_bbox: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 over positive anchors (model.py:688-718).

    target_bbox: [..., T, 4] packed positives-first (rpn_targets layout,
    matching the reference's np.where packing); rpn_match: [..., A];
    rpn_bbox: [..., A, 4] predictions.
    """
    a = rpn_match.shape[-1]
    t = target_bbox.shape[-2]
    pos = rpn_match == 1

    def per_image(pos_i, pred_i, tgt_i):
        idx = jnp.arange(a)
        packed = jnp.argsort(jnp.where(pos_i, idx, a + idx))[:t]
        pvalid = pos_i[packed].astype(jnp.float32)
        diff = smooth_l1(pred_i[packed] - tgt_i)
        return (jnp.sum(diff * pvalid[:, None]),
                jnp.sum(pvalid) * 4.0)

    if rpn_match.ndim == 1:
        num, den = per_image(pos, rpn_bbox, target_bbox)
    else:
        num, den = jax.vmap(per_image)(pos, rpn_bbox, target_bbox)
        num, den = num.sum(), den.sum()
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def mrn_class_loss(target_class_ids: jnp.ndarray, logits: jnp.ndarray,
                   valid: jnp.ndarray) -> jnp.ndarray:
    """Head classification CE over real (pos+neg) RoIs (model.py:802-814)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, target_class_ids[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _masked_mean(nll, valid.astype(jnp.float32))


def mrn_box_loss(target_class_ids: jnp.ndarray, target_deltas: jnp.ndarray,
                 pred_deltas: jnp.ndarray,
                 positive: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 on the target class's deltas, positives only
    (model.py:816-845)."""
    cls = target_class_ids.astype(jnp.int32)
    pred = jnp.take_along_axis(
        pred_deltas, cls[..., None, None].repeat(4, -1), axis=-2)
    pred = jnp.squeeze(pred, axis=-2)
    diff = smooth_l1(pred - target_deltas)
    mask = positive.astype(jnp.float32)[..., None].repeat(4, -1)
    return _masked_mean(diff, mask)


def mask_loss(target_class_ids: jnp.ndarray, target_masks: jnp.ndarray,
              pred_masks: jnp.ndarray,
              positive: jnp.ndarray) -> jnp.ndarray:
    """Binary CE on the target class's mask, positives only
    (model.py:922-953). pred_masks: [..., N, 28, 28, K] sigmoid probs.
    """
    cls = target_class_ids.astype(jnp.int32)
    pred = jnp.take_along_axis(
        pred_masks, cls[..., None, None, None], axis=-1)[..., 0]
    eps = 1e-7  # F.binary_cross_entropy clamps log terms
    p = jnp.clip(pred, eps, 1.0 - eps)
    bce = -(target_masks * jnp.log(p)
            + (1.0 - target_masks) * jnp.log(1.0 - p))
    mask = positive.astype(jnp.float32)[..., None, None]
    mask = jnp.broadcast_to(mask, bce.shape)
    return _masked_mean(bce, mask)


def keypoint_loss(kp_pos: jnp.ndarray, kp_valid: jnp.ndarray,
                  kp_logits: jnp.ndarray) -> jnp.ndarray:
    """Spatial softmax cross-entropy per keypoint (Mask R-CNN paper
    "Human Pose Estimation": each visible keypoint is a one-hot
    classification over the heatmap positions).

    kp_pos: [..., T, K] int32 flattened target heatmap index;
    kp_valid: [..., T, K] bool; kp_logits: [..., T, Hh, Wh, K].
    Mean over valid (positive-RoI, labeled, inside-box) keypoints.
    """
    *lead, t, hh, hw, k = kp_logits.shape
    flat = jnp.moveaxis(kp_logits, -1, -3)        # [..., T, K, Hh, Wh]
    flat = flat.reshape(*lead, t, k, hh * hw)
    logp = jax.nn.log_softmax(flat, axis=-1)
    nll = -jnp.take_along_axis(
        logp, kp_pos[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _masked_mean(nll, kp_valid.astype(jnp.float32))


class Losses(NamedTuple):
    """The task losses. `mrn_kp` is the optional keypoint branch
    (config.NUM_KEYPOINTS > 0) and stays 0.0 when disabled, so the
    5-task reference-parity sum is unchanged."""

    total: jnp.ndarray
    rpn_class: jnp.ndarray
    rpn_box: jnp.ndarray
    mrn_class: jnp.ndarray
    mrn_box: jnp.ndarray
    mrn_mask: jnp.ndarray
    mrn_kp: jnp.ndarray

    def as_dict(self):
        return {f: getattr(self, f) for f in self._fields}
