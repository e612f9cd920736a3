"""Cascade R-CNN branch (config.CASCADE_STAGES, beyond the reference).

Covers: default-off bit-identity of the param tree, stage relabeling
semantics (cascade_targets), end-to-end cascade inference shapes,
gradient flow into every stage head, and the checkpoint
fine-tune-the-new-branch flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.ops import boxes as box_ops
from maskrcnn_tpu.train.targets import cascade_targets

CASCADE = (0.5, 0.6, 0.7)


@pytest.fixture(scope="module")
def base_and_cascade_params():
    base = MaskRCNN(TinyConfig())
    cas = MaskRCNN(TinyConfig(CASCADE_STAGES=CASCADE))
    key = jax.random.PRNGKey(0)
    return base.init(key), cas.init(key)


def test_param_tree_off_vs_on(base_and_cascade_params):
    pb, pc = base_and_cascade_params
    assert "box_head2" not in pb and "box_head3" not in pb
    assert set(pc) - set(pb) == {"box_head2", "box_head3"}
    # fold_in init: shared subtrees stay bit-identical to the base build
    for k in pb:
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(pb[k]),
                jax.tree_util.tree_leaves_with_path(pc[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{k}{kp}")
    # extra heads share the BoxHead structure but not the values
    assert (jax.tree_util.tree_structure(pc["box_head2"])
            == jax.tree_util.tree_structure(pc["box_head"]))
    a0 = np.asarray(pc["box_head"]["linear_class"]["kernel"])
    a2 = np.asarray(pc["box_head2"]["linear_class"]["kernel"])
    a3 = np.asarray(pc["box_head3"]["linear_class"]["kernel"])
    assert not np.array_equal(a0, a2) and not np.array_equal(a2, a3)


def test_cascade_targets_relabels_at_threshold():
    cfg = TinyConfig(CASCADE_STAGES=CASCADE)
    gt_boxes = jnp.asarray([[0.2, 0.2, 0.6, 0.6],
                            [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    gt_cls = jnp.asarray([3, 0], jnp.int32)
    gt_valid = jnp.asarray([True, False])
    rois = jnp.asarray([
        [0.2, 0.2, 0.6, 0.6],      # IoU 1.0 -> positive
        [0.25, 0.25, 0.6, 0.6],    # IoU ~0.77 -> positive at 0.7
        [0.2, 0.2, 0.4, 0.4],      # IoU 0.25 -> negative
        [0.0, 0.0, 0.0, 0.0],      # padded slot
    ], jnp.float32)
    roi_valid = jnp.asarray([True, True, True, False])
    std = jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32) / 3.0

    tgt = cascade_targets(cfg, rois, roi_valid, gt_cls, gt_boxes,
                          gt_valid, pos_iou=0.7, std=std)
    assert tgt.positive.tolist() == [True, True, False, False]
    assert tgt.class_ids.tolist() == [3, 3, 0, 0]
    assert tgt.valid.tolist() == [True, True, True, False]
    want = np.asarray(
        box_ops.box_deltas(rois[1], gt_boxes[0]) / std)
    np.testing.assert_allclose(np.asarray(tgt.deltas[1]), want,
                               rtol=1e-5)
    assert (np.asarray(tgt.deltas[2:]) == 0).all()

    # a crowd gt suppresses nearby rois from the class loss
    gt_cls_crowd = jnp.asarray([3, -5], jnp.int32)
    gt_boxes_crowd = gt_boxes.at[1].set(
        jnp.asarray([0.18, 0.18, 0.42, 0.42]))
    tgt = cascade_targets(cfg, rois, roi_valid, gt_cls_crowd,
                          gt_boxes_crowd, jnp.asarray([True, True]),
                          pos_iou=0.7, std=std)
    assert bool(tgt.valid[2]) is False   # negative overlapping a crowd
    assert bool(tgt.valid[0]) is True    # positives always train


def test_cascade_predict_shapes(base_and_cascade_params):
    from maskrcnn_tpu.detection.pipeline import predict_step
    _, pc = base_and_cascade_params
    cfg = TinyConfig(CASCADE_STAGES=CASCADE)
    model = MaskRCNN(cfg)
    d = cfg.IMAGE_MAX_DIM
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (2, d, d, 3), np.uint8)
    windows = np.asarray([[0, 0, d, d]] * 2, np.float32)
    out = predict_step(model, pc, images, windows)
    dmax = cfg.DETECTION_MAX_INSTANCES
    assert out["class_ids"].shape == (2, dmax)
    assert out["boxes"].shape == (2, dmax, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # boxes stay inside the canvas after 3 stages of refinement
    bx = np.asarray(out["boxes"])
    assert (bx >= 0).all() and (bx <= d).all()


@pytest.mark.slow
def test_cascade_composes_with_tta_and_soft_nms(base_and_cascade_params):
    """All three opt-in protocols stacked: 3-stage cascade box branch,
    flip-TTA double pass, and soft-NMS decay in both the per-pass
    refinement and the merge. One predict_step must compile and produce
    a coherent detection set."""
    from maskrcnn_tpu.detection.pipeline import predict_step
    _, pc = base_and_cascade_params
    cfg = TinyConfig(CASCADE_STAGES=CASCADE, TTA_HFLIP=True,
                     DETECTION_SOFT_NMS_SIGMA=0.5,
                     DETECTION_MIN_CONFIDENCE=0.0)
    model = MaskRCNN(cfg)
    d = cfg.IMAGE_MAX_DIM
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (2, d, d, 3), np.uint8)
    windows = np.asarray([[0, 0, d, d]] * 2, np.float32)
    out = predict_step(model, pc, images, windows)
    dmax = cfg.DETECTION_MAX_INSTANCES
    assert out["class_ids"].shape == (2, dmax)
    scores = np.asarray(out["scores"])
    valid = np.asarray(out["valid"])
    assert np.isfinite(scores).all()
    assert (scores[valid] > 0).all()
    # survivors are score-sorted in the slot prefix per image
    for i in range(2):
        assert (np.diff(scores[i][valid[i]]) <= 1e-6).all()
    bx = np.asarray(out["boxes"])
    assert (bx >= 0).all() and (bx <= d).all()


def test_cascade_train_step_runs_finite():
    """Full jitted train step with the cascade config: finite losses and
    a step taken. (Random-init proposals may sample zero positive RoIs
    on one batch — reference-parity behavior — so head-loss magnitude
    is checked deterministically in the gradient test below.)"""
    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)
    cfg = TinyConfig(CASCADE_STAGES=CASCADE)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, 1e-3, decay_mask(params, regex))
    state = TrainState(step=np.int32(0), params=params,
                       opt_state=opt.init(params))
    batch = next(SyntheticLoader(cfg, 2))
    new_state, metrics = train_step(model, (opt, lambda p: tmask), state,
                                    batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert float(metrics["rpn_class"]) > 0.0
    assert int(new_state.step) == 1


def test_cascade_mask_last_train_step(base_and_cascade_params):
    """CASCADE_MASK_LAST (Cascade Mask R-CNN mask placement): the train
    step runs finite, and the mask-head gradients differ from the
    default stage-0 placement on the same batch+key (the mask branch
    really pools different boxes).

    Random-init proposals rarely clear the production 0.5/0.7 IoU
    thresholds (both arms would then have zero mask positives and
    trivially equal zero grads), so this test runs the cascade at
    near-zero thresholds — every stage keeps positives and the only
    difference between the arms is the mask placement."""
    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.train.step import compute_losses

    _, params = base_and_cascade_params
    loose = (0.01, 0.01, 0.01)

    def mask_grads(cfg):
        model = MaskRCNN(cfg)
        batch = next(SyntheticLoader(cfg, 2))

        def f(p):
            return compute_losses(model, p, jax.random.PRNGKey(1),
                                  batch).total

        g = jax.grad(f)(params)
        return float(f(params)), np.asarray(
            g["mask_head"]["conv1"]["kernel"], np.float32)

    t0, g0 = mask_grads(TinyConfig(CASCADE_STAGES=loose))
    t1, g1 = mask_grads(TinyConfig(CASCADE_STAGES=loose,
                                   CASCADE_MASK_LAST=True))
    assert np.isfinite(t0) and np.isfinite(t1)
    assert np.isfinite(g1).all()
    # positives must exist in the baseline arm, else the comparison is
    # vacuous
    assert np.abs(g0).max() > 0
    # same data/key: any difference must come from the mask placement
    assert not np.allclose(g0, g1)


def test_cascade_mask_last_with_keypoints():
    """CASCADE_MASK_LAST + keypoint branch: the keypoint head must keep
    pooling its stage-0 positive PREFIX (last-stage positives are not
    prefix-packed), so the composed step stays finite and the kp loss
    is well-defined."""
    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.train.step import compute_losses

    cfg = TinyConfig(CASCADE_STAGES=(0.01, 0.01, 0.01),
                     CASCADE_MASK_LAST=True, NUM_KEYPOINTS=4,
                     KEYPOINT_HEAD_CONVS=2, KEYPOINT_HEAD_DIM=32)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(cfg, 2))
    losses = compute_losses(model, params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(losses.total))
    assert np.isfinite(float(losses.mrn_kp))
    assert np.isfinite(float(losses.mrn_mask))


def test_cascade_stage_heads_receive_gradients(base_and_cascade_params):
    """Deterministic gradient flow: a handcrafted RoI set with a known
    high-IoU positive drives every stage's class+box loss; all three
    stage heads must receive nonzero gradients."""
    from maskrcnn_tpu.train import losses as L
    _, params = base_and_cascade_params
    cfg = TinyConfig(CASCADE_STAGES=CASCADE)
    model = MaskRCNN(cfg)

    t = 4
    rois = jnp.asarray([[0.2, 0.2, 0.6, 0.6],
                        [0.22, 0.22, 0.6, 0.6],
                        [0.6, 0.6, 0.9, 0.9],
                        [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    roi_valid = jnp.asarray([True, True, True, False])
    gt_boxes = jnp.asarray([[0.2, 0.2, 0.6, 0.6]], jnp.float32)
    gt_cls = jnp.asarray([2], jnp.int32)
    gt_valid = jnp.asarray([True])
    pooled = jax.random.normal(jax.random.PRNGKey(3),
                               (t, cfg.POOL_SIZE, cfg.POOL_SIZE, 256))
    std_base = jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32)

    def loss_fn(p):
        total = jnp.float32(0.0)
        for i, thresh in enumerate(CASCADE):
            logits, _, deltas = model.classify_stage(p, pooled, i)
            tgt = cascade_targets(cfg, rois, roi_valid, gt_cls, gt_boxes,
                                  gt_valid, pos_iou=thresh,
                                  std=std_base / (i + 1))
            tgt = jax.tree_util.tree_map(jax.lax.stop_gradient, tgt)
            total = total + L.mrn_class_loss(
                tgt.class_ids[None], logits[None], tgt.valid[None])
            total = total + L.mrn_box_loss(
                tgt.class_ids[None], tgt.deltas[None], deltas[None],
                tgt.positive[None])
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert float(loss) > 0.0
    for key in ("box_head", "box_head2", "box_head3"):
        g = np.asarray(grads[key]["linear_class"]["kernel"])
        assert np.abs(g).sum() > 0.0, f"{key} got zero gradient"
    # untouched branches stay zero
    assert np.abs(np.asarray(
        jax.tree_util.tree_leaves(grads["mask_head"])[0])).sum() == 0.0


def test_int8_prepare_keeps_cascade_heads(base_and_cascade_params):
    """prepare_quant_params must carry the float cascade stage heads
    through to the inference tree (they stay float like the base box
    head — int8_heads_gate reasoning). Execution of the quantized
    cascade pipeline is covered on real hardware (BENCHMARKS.md)."""
    from maskrcnn_tpu import quant
    _, pc = base_and_cascade_params
    cfg = TinyConfig(CASCADE_STAGES=CASCADE)
    model = MaskRCNN(cfg)
    d = cfg.IMAGE_MAX_DIM
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, d, d, 3), np.uint8)
    qparams = quant.prepare_quant_params(model, pc, imgs, batch_size=2)
    for key in ("box_head", "box_head2", "box_head3"):
        assert key in qparams
        np.testing.assert_array_equal(
            np.asarray(qparams[key]["linear_class"]["kernel"]),
            np.asarray(pc[key]["linear_class"]["kernel"]))


def test_two_head_checkpoint_into_cascade(base_and_cascade_params,
                                          tmp_path):
    from maskrcnn_tpu.checkpoint.store import load_params, save_checkpoint
    pb, pc = base_and_cascade_params
    run = str(tmp_path / "base_run")
    save_checkpoint(run, pb, 1)
    merged = load_params(run, pc, "resnet50")
    # shared subtrees restore from the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(merged["box_head"]["linear_class"]["kernel"]),
        np.asarray(pb["box_head"]["linear_class"]["kernel"]))
    # ...and the cascade branches keep their init
    for key in ("box_head2", "box_head3"):
        np.testing.assert_array_equal(
            np.asarray(merged[key]["linear_class"]["kernel"]),
            np.asarray(pc[key]["linear_class"]["kernel"]))
