"""Jitted training forward + loss + SGD update.

TPU-native rebuild of the reference training internals:
* forward = `extract` (reference: model.py:1205-1292) — backbone, RPN,
  proposal layer, on-device target sampling, heads;
* loss = 5-term sum (model.py:1623-1629);
* update = SGD momentum 0.9, weight decay 1e-4 on non-BN params
  (model.py:1542-1557), global-norm grad clip 5.0 (model.py:1633).

One deliberate deviation: the loss is the *mean* over the batch, where the
reference accumulates per-image gradients by summation over BATCH_SIZE
single-image backward passes (model.py:1632-1637). At the reference's
effective batch 1 they coincide; at larger batches mean+LR-scaling is the
standard, numerically safer formulation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maskrcnn_tpu.detection.pipeline import _pool_rois, rpn_refine
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.ops.image import normalize_image
from maskrcnn_tpu.train import losses as L
from maskrcnn_tpu.train.targets import mrn_targets, rpn_targets


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def compute_losses(model: MaskRCNN, params, key, batch) -> L.Losses:
    """Full training forward pass -> 5-term loss.

    batch dict (all fixed shapes, B = per-call batch):
      images:       [B, H, W, 3] uint8 canvas
      gt_class_ids: [B, G] int32 (negative = crowd, 0 = padding)
      gt_boxes:     [B, G, 4] float32 pixel canvas coords
      gt_masks:     [B, G, H, W] uint8 {0,1}  — or bit-packed
      gt_masks_packed: [B, G, H, W/8] uint8 (np.packbits; 8x less
        host->device traffic, unpacked on device)
      gt_valid:     [B, G] bool
      gt_keypoints: [B, G, K, 3] float32 (y, x, v) canvas coords —
        optional; trains the keypoint branch when NUM_KEYPOINTS > 0
    """
    config = model.config
    h, w = config.IMAGE_SHAPE[:2]
    b = batch["images"].shape[0]
    if "gt_masks_packed" in batch:
        from maskrcnn_tpu.ops.bits import unpack_masks
        batch = dict(batch)
        batch["gt_masks"] = unpack_masks(batch.pop("gt_masks_packed"), w)

    # REMAT_HEADS: checkpoint the head applies so their large internals
    # (RPN shared 512ch conv ~89 MB/img, mask conv stack ~80 MB/img in
    # bf16) are recomputed in backward instead of held across the step —
    # the inputs (FPN features, pooled RoIs) are live regardless.
    rpn_fn, classify_fn, masks_fn = (model.rpn_detect, model.classify,
                                     model.predict_masks)
    kp_on = config.NUM_KEYPOINTS > 0 and "gt_keypoints" in batch
    kp_fn = model.predict_keypoints if kp_on else None
    if config.REMAT_HEADS:
        rpn_fn = jax.checkpoint(rpn_fn)
        classify_fn = jax.checkpoint(classify_fn)
        masks_fn = jax.checkpoint(masks_fn)
        if kp_on:
            kp_fn = jax.checkpoint(kp_fn)

    x = normalize_image(batch["images"], config.MEAN_PIXEL)
    feats = model.backbone(params, x)
    rpn_logits, rpn_probs, rpn_bbox = rpn_fn(params, feats)

    anchors = jnp.asarray(model.anchors())
    keys = jax.random.split(key, 2 * b)
    rpn_keys, mrn_keys = keys[:b], keys[b:]

    rpn_tgt = jax.vmap(
        lambda k, c, bx, v: rpn_targets(config, k, anchors, c, bx, v))(
            rpn_keys, batch["gt_class_ids"], batch["gt_boxes"],
            batch["gt_valid"])

    proposals, pvalid = jax.vmap(
        lambda p, d: rpn_refine(config, anchors, p, d))(rpn_probs, rpn_bbox)

    norm = jnp.asarray([h, w, h, w], jnp.float32)
    gt_boxes_norm = batch["gt_boxes"] / norm  # model.py:1258-1259

    stage0_iou = (config.CASCADE_STAGES[0] if config.CASCADE_STAGES
                  else 0.5)
    mrn_tgt = jax.vmap(
        lambda k, p, pv, c, bx, m, v: mrn_targets(config, k, p, pv, c, bx,
                                                  m, v,
                                                  pos_iou=stage0_iou))(
            mrn_keys, proposals, pvalid, batch["gt_class_ids"],
            gt_boxes_norm, batch["gt_masks"], batch["gt_valid"])
    # Targets are constants w.r.t. the params — the reference detaches
    # them (model.py:484 boxes_deltas on .data, model.py:502 .data crop).
    # Without this, gradients flow through log()/div of degenerate padded
    # boxes and poison the whole step with NaN.
    mrn_tgt = jax.tree_util.tree_map(jax.lax.stop_gradient, mrn_tgt)

    t = config.TRAIN_ROIS_PER_IMAGE
    # Cascade R-CNN (config.CASCADE_STAGES, beyond the reference): stage
    # 0 is the reference-parity sampled head; later stages relabel the
    # previous stage's refined boxes at rising IoU thresholds with a
    # tightening delta-std schedule (no re-sampling past stage 0, like
    # Detectron2's CascadeROIHeads). mrn_class/mrn_box report the SUM
    # over stages (each stage weighted 1, per the paper).
    stages = max(1, len(config.CASCADE_STAGES))
    std_base = jnp.asarray(config.BBOX_STD_DEV, jnp.float32)
    rois = mrn_tgt.rois
    l_mrn_c = jnp.float32(0.0)
    l_mrn_b = jnp.float32(0.0)
    for i in range(stages):
        if i == 0:
            cls_fn = classify_fn
        else:
            cls_fn = functools.partial(model.classify_stage, stage=i)
            if config.REMAT_HEADS:
                cls_fn = jax.checkpoint(cls_fn)
        pooled = _pool_rois(feats, rois, config.POOL_SIZE,
                            config.IMAGE_SHAPE)
        mrn_logits, mrn_probs, mrn_deltas = cls_fn(
            params, pooled.reshape(b * t, *pooled.shape[2:]))
        mrn_logits = mrn_logits.reshape(b, t, -1)
        mrn_probs = mrn_probs.reshape(b, t, -1)
        mrn_deltas = mrn_deltas.reshape(b, t, config.NUM_CLASSES, 4)
        if i == 0:
            tgt = mrn_tgt
        else:
            from maskrcnn_tpu.train.targets import cascade_targets
            tgt = jax.vmap(
                lambda r_, v_, c_, bx_, gv_: cascade_targets(
                    config, r_, v_, c_, bx_, gv_,
                    config.CASCADE_STAGES[i], std_base / (i + 1)))(
                        rois, mrn_tgt.valid, batch["gt_class_ids"],
                        gt_boxes_norm, batch["gt_valid"])
            tgt = jax.tree_util.tree_map(jax.lax.stop_gradient, tgt)
        l_mrn_c = l_mrn_c + L.mrn_class_loss(tgt.class_ids, mrn_logits,
                                             tgt.valid)
        l_mrn_b = l_mrn_b + L.mrn_box_loss(tgt.class_ids, tgt.deltas,
                                           mrn_deltas, tgt.positive)
        if i < stages - 1:
            from maskrcnn_tpu.ops import boxes as box_ops
            fg = jnp.argmax(mrn_probs[..., 1:], axis=-1) + 1   # [B, T]
            sel = jnp.take_along_axis(
                mrn_deltas,
                jnp.broadcast_to(fg[..., None, None], (b, t, 1, 4)),
                axis=2)[:, :, 0]
            sel = sel.astype(jnp.float32) * (std_base / (i + 1))
            nxt = box_ops.refine_boxes(rois, sel)
            nxt = box_ops.clip_boxes(nxt, (0.0, 0.0, 1.0, 1.0))
            nxt = jnp.where(mrn_tgt.valid[..., None], nxt, 0.0)
            rois = jax.lax.stop_gradient(nxt)

    # Mask branch RoIs: stage-0 samples by default. With
    # CASCADE_MASK_LAST (Cascade Mask R-CNN "mask at the last stage"),
    # the mask head instead trains on the LAST stage's refined +
    # relabeled boxes — the distribution the serving path pools from
    # (inference masks always pool on cascade-refined detections) —
    # with mask targets re-cropped at those boxes.
    mask_rois, mask_masks = mrn_tgt.rois, mrn_tgt.masks
    mask_cls, mask_pos = mrn_tgt.class_ids, mrn_tgt.positive
    if stages > 1 and getattr(config, "CASCADE_MASK_LAST", False):
        from maskrcnn_tpu.ops.roi_align import indexed_crop_and_resize
        mh = config.MASK_SHAPE[0]
        crops = jax.vmap(
            lambda m, r_, a_: indexed_crop_and_resize(
                m[..., None], r_, a_, mh)[..., 0])(
                    batch["gt_masks"], rois, tgt.assignment)
        mask_masks = jax.lax.stop_gradient(jnp.where(
            tgt.positive[..., None, None], jnp.round(crops), 0.0))
        mask_rois, mask_cls, mask_pos = rois, tgt.class_ids, tgt.positive

    pooled_m = _pool_rois(feats, mask_rois, config.MASK_POOL_SIZE,
                          config.IMAGE_SHAPE)
    pred_masks = masks_fn(
        params, pooled_m.reshape(b * t, *pooled_m.shape[2:]))
    pred_masks = pred_masks.reshape(b, t, *pred_masks.shape[1:])

    l_rpn_c = L.rpn_class_loss(rpn_tgt.rpn_match, rpn_logits)
    l_rpn_b = L.rpn_box_loss(rpn_tgt.rpn_bbox, rpn_tgt.rpn_match, rpn_bbox)
    l_mask = L.mask_loss(mask_cls, mask_masks, pred_masks, mask_pos)

    # Optional keypoint branch (Mask R-CNN paper's third task; no
    # reference equivalent). Shares the mask head's pooled RoIs.
    l_kp = jnp.float32(0.0)
    if kp_on:
        from maskrcnn_tpu.train.targets import keypoint_targets
        # only positive RoIs carry keypoint targets, and mrn_targets
        # packs positives into the first p_cap slots by construction —
        # running the head (the costliest per-RoI compute, ~8x conv512)
        # on that static prefix is exact and ~3x cheaper. With
        # CASCADE_MASK_LAST the shared pooled_m holds last-stage boxes
        # (whose positives are NOT prefix-packed), so the keypoint
        # branch pools its own stage-0 prefix.
        p_cap = int(t * config.ROI_POSITIVE_RATIO)
        if mask_rois is mrn_tgt.rois:
            pooled_kp = pooled_m[:, :p_cap]
        else:
            pooled_kp = _pool_rois(feats, mrn_tgt.rois[:, :p_cap],
                                   config.MASK_POOL_SIZE,
                                   config.IMAGE_SHAPE)
        kp_logits = kp_fn(
            params, pooled_kp.reshape(b * p_cap, *pooled_kp.shape[2:]))
        assert kp_logits.shape[1:3] == tuple(config.KEYPOINT_SHAPE), (
            f"KEYPOINT_SHAPE {config.KEYPOINT_SHAPE} != head output "
            f"{kp_logits.shape[1:3]} (= 4 * MASK_POOL_SIZE)")
        kp_logits = kp_logits.reshape(b, p_cap, *kp_logits.shape[1:])
        kp_pos, kp_valid = jax.vmap(
            lambda r, a, p, g: keypoint_targets(config, r, a, p, g))(
                mrn_tgt.rois[:, :p_cap],
                mrn_tgt.gt_assignment[:, :p_cap],
                mrn_tgt.positive[:, :p_cap], batch["gt_keypoints"])
        l_kp = L.keypoint_loss(kp_pos, kp_valid, kp_logits)

    total = l_rpn_c + l_rpn_b + l_mrn_c + l_mrn_b + l_mask + l_kp
    return L.Losses(total=total, rpn_class=l_rpn_c, rpn_box=l_rpn_b,
                    mrn_class=l_mrn_c, mrn_box=l_mrn_b, mrn_mask=l_mask,
                    mrn_kp=l_kp)


def make_optimizer(config, learning_rate: float, decay_mask) -> optax.GradientTransformation:
    """SGD + momentum + selective weight decay + grad clip.

    Order matches torch exactly: clip grads (model.py:1633), add wd*param
    for non-BN params (SGD weight_decay semantics, model.py:1550-1557),
    momentum, lr.

    OPT_MOMENTUM_DTYPE="bfloat16" stores the momentum buffers in bf16
    (halves optimizer-state HBM: ~126 MB for the 63M-param model).
    Throughput-wise the optimizer moves ~0.5 GB/step of state — <1 ms
    of a ~670 ms b16 step (see BENCHMARKS.md training section) — so the
    default stays float32, which avoids momentum rounding drift; the
    knob exists for HBM headroom, not speed.
    """
    acc_dtype = getattr(config, "OPT_MOMENTUM_DTYPE", "float32")
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.add_decayed_weights(config.WEIGHT_DECAY, mask=decay_mask),
        optax.trace(decay=config.LEARNING_MOMENTUM, nesterov=False,
                    accumulator_dtype=jnp.dtype(acc_dtype)),
        optax.scale(-learning_rate),
    )


def split_accum(batch: Dict[str, Any], accum: int) -> Dict[str, Any]:
    """Micro-stack a host batch for GRAD_ACCUM_STEPS: every leaf
    [B, ...] -> [accum, B//accum, ...]. Done on the HOST (numpy) before
    shard_batch so that under data parallelism the sharded axis is the
    micro-batch axis and each scan iteration stays device-local."""
    if accum <= 1:
        return batch
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        assert v.shape[0] % accum == 0, (
            f"batch dim {v.shape[0]} not divisible by "
            f"GRAD_ACCUM_STEPS={accum}")
        out[k] = v.reshape(accum, v.shape[0] // accum, *v.shape[1:])
    return out


@functools.partial(jax.jit, static_argnums=(0, 1))
def train_step(model: MaskRCNN, optimizer_and_mask, state: TrainState,
               batch, key) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step. optimizer_and_mask = (optax transform, trainable
    mask pytree as a hashable static-free closure) — see trainer.py.

    Not donating here keeps direct calls safe for callers that reuse
    params (tests, notebooks); the production path is
    `parallel.make_parallel_train_step`, which wraps this with state
    donation (param/momentum buffers reused in-place — halves
    train-state HBM). The non-finite-loss skip guard lives in-graph so
    donation never strands the caller without a rollback copy: a NaN/Inf
    total selects the old params/opt-state instead of the update (the
    reference has no such guard; SURVEY section 5 failure detection)."""
    optimizer, trainable_fn = optimizer_and_mask

    accum = getattr(model.config, "GRAD_ACCUM_STEPS", 1)
    if accum > 1:
        # batch leaves arrive micro-stacked [A, B/A, ...] (split_accum)
        # so the scan slices stay local to each device's shard under dp.
        def loss_fn_m(params, k, mb):
            losses = compute_losses(model, params, k, mb)
            return losses.total, losses

        def body(carry, inp):
            gsum, lsum = carry
            k, mb = inp
            g, l = jax.grad(loss_fn_m, has_aux=True)(state.params, k, mb)
            return (jax.tree_util.tree_map(jnp.add, gsum, g),
                    jax.tree_util.tree_map(jnp.add, lsum, l)), None

        zeros_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, p.dtype), state.params)
        zeros_l = L.Losses(*([jnp.float32(0.0)] * len(L.Losses._fields)))
        keys = jax.random.split(key, accum)
        (gsum, lsum), _ = jax.lax.scan(body, (zeros_g, zeros_l),
                                       (keys, batch))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        losses = jax.tree_util.tree_map(lambda v: v / accum, lsum)
    else:
        def loss_fn(params):
            losses = compute_losses(model, params, key, batch)
            return losses.total, losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
    # Freeze: zero non-trainable grads BEFORE clipping so the clip norm
    # only sees trainable params (torch clips params-with-grad only).
    trainable = trainable_fn(state.params)
    grads = jax.tree_util.tree_map(
        lambda g, t: g * jnp.asarray(t, g.dtype), grads, trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ok = jnp.isfinite(losses.total)
    keep = lambda new, old: jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new, old)
    new_state = TrainState(
        step=state.step + jnp.asarray(ok, state.step.dtype),
        params=keep(params, state.params),
        opt_state=keep(opt_state, state.opt_state))
    return new_state, losses.as_dict()
