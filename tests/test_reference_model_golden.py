"""Golden-diff the COMPOSED pipeline against the reference's own model.py.

tests/reference_oracle.py imports the reference's torch `MaskRCNN`
(reference model.py:959-1487) with its own compiled NMS/crop kernels;
this file drives it side by side with our pipeline on IDENTICAL weights
(flax init -> checkpoint.torch_convert.to_torch_state_dict -> reference
load_state_dict — the exact converter surface a real mask_rcnn_coco.pth
flows through, in reverse).

Two kinds of checks:

* stage-isolated (composition-exact): feed the REFERENCE's own
  intermediate outputs into OUR stage and diff against the reference's
  next intermediate — no floating-point drift can accumulate across
  stages, so tolerances are tight. Covers: RPN head ordering,
  rpn_refine (top-k -> decode -> clip -> NMS -> normalize), box head on
  shared proposals, mrn_refine (class-offset multiclass NMS vs the
  reference's per-class Python loop), mask head on shared detections.
* end-to-end (drift-tolerant): the full predict_step vs the reference's
  predict() on the same canvas, matching detections by class + IoU.

256x256 canvas, resnet101, f32 (the reference hard-codes resnet101 at
model.py:985; 256 is the smallest multiple-of-64 canvas that exercises
all five pyramid levels with non-degenerate P6=4x4).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from maskrcnn_tpu.config import CocoInferenceConfig
from maskrcnn_tpu.checkpoint.torch_convert import to_torch_state_dict
from maskrcnn_tpu.detection import pipeline
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.ops.bits import unpack_masks
from maskrcnn_tpu.ops.image import normalize_image
from tests.reference_oracle import load, make_inference_config

pytestmark = pytest.mark.slow

DIM = 256


def _to_nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _rel_close(a, b, tol, what=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-3)
    diff = np.abs(a - b).max()
    assert diff <= tol * scale, f"{what}: max|diff|={diff:.3e} scale={scale:.3e}"


@pytest.fixture(scope="module")
def ora():
    ref = load()
    if ref is None:
        pytest.skip("reference tree or C toolchain unavailable")
    torch.manual_seed(0)

    ref_cfg = make_inference_config(ref, DIM)
    cfg = CocoInferenceConfig(
        IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM, COMPUTE_DTYPE="float32",
        ROI_IMPL="xla", REMAT_BACKBONE=False)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(3))

    # Jitter BN stats so frozen-BN folding is genuinely exercised, and
    # tame the RPN logit scale: with raw random init the fg softmax
    # saturates (3597 anchors at exactly 1.0 on this canvas), making
    # every top-k / NMS ordering pure tie-breaking chaos that no two
    # sort implementations share. 0.02x on the 1x1 heads keeps scores
    # distinct (real checkpoints are in this regime) without touching
    # the backbone/FPN being tested.
    def jitter(path, p):
        name = str(path[-1])
        path_s = "/".join(str(q) for q in path)
        if "running_mean" in name:
            return p + 0.25
        if "running_var" in name:
            return p * 1.6 + 0.05
        if "conv_class" in path_s or "conv_bbox" in path_s:
            return p * 0.02
        return p
    params = jax.tree_util.tree_map_with_path(jitter, params)

    import tempfile
    net = ref.model.MaskRCNN(config=ref_cfg, model_dir=tempfile.mkdtemp())
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in to_torch_state_dict(params, cfg.BACKBONE).items()}
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected[:5]
    assert all("num_batches_tracked" in m for m in missing), missing[:5]
    net.eval()

    rng = np.random.RandomState(11)
    image = rng.randint(0, 256, (DIM, DIM, 3), np.uint8)
    window = [0, 0, DIM, DIM]

    molded_np = ref.model.mold_image(image, ref_cfg)  # HWC f32
    molded_t = torch.from_numpy(
        molded_np.transpose(2, 0, 1)).float().unsqueeze(0)

    with torch.no_grad():
        maps = net.fpn(molded_t)  # [p2..p6] NCHW
        rpn_logits, rpn_class, rpn_bbox = net.rpn_detect(maps)
        rois = net.rpn_refine(rpn_class, rpn_bbox)  # [1, N, 4] normalized
        mrn_logits, mrn_probs, mrn_deltas = net.mrn_detect(maps[:4], rois)
        det_ids, det_scores, det_boxes = net.mrn_refine(
            rois, mrn_probs, mrn_deltas, window)

    ours_x = normalize_image(jnp.asarray(image[None]), cfg.MEAN_PIXEL)
    our_maps = jax.jit(model.backbone)(params, ours_x)

    return dict(ref=ref, ref_cfg=ref_cfg, net=net, cfg=cfg, model=model,
                params=params, image=image, window=window,
                molded_t=molded_t, maps=maps, rpn_class=rpn_class,
                rpn_bbox=rpn_bbox, rois=rois, mrn_probs=mrn_probs,
                mrn_deltas=mrn_deltas, det_ids=det_ids,
                det_scores=det_scores, det_boxes=det_boxes,
                our_maps=our_maps)


def test_anchor_grid_bit_equal(ora):
    ref_anchors = ora["net"].anchors.numpy()
    ours = np.asarray(ora["model"].anchors(), np.float32)
    assert ref_anchors.shape == ours.shape
    np.testing.assert_array_equal(ref_anchors, ours)


def test_backbone_fpn(ora):
    for lvl, (ref_map, our_map) in enumerate(zip(ora["maps"],
                                                 ora["our_maps"])):
        _rel_close(np.asarray(our_map),
                   ref_map.numpy().transpose(0, 2, 3, 1),
                   2e-4, f"P{lvl + 2}")


def test_rpn_head_on_reference_maps(ora):
    """Our RPN on the REFERENCE's pyramid: isolates head + anchor order."""
    model, params = ora["model"], ora["params"]
    feats = [_to_nhwc(m) for m in ora["maps"]]
    _, probs, bbox = jax.jit(model.rpn_detect)(params, feats)
    _rel_close(np.asarray(probs[0]), ora["rpn_class"][0].numpy(), 1e-4,
               "rpn probs")
    _rel_close(np.asarray(bbox[0]), ora["rpn_bbox"][0].numpy(), 1e-4,
               "rpn deltas")
    # the fused inference form equals probs[:, 1]
    fg, bbox2 = jax.jit(model.rpn_scores)(params, feats)
    _rel_close(np.asarray(fg[0]), ora["rpn_class"][0, :, 1].numpy(), 1e-4,
               "rpn fg scores (fused)")
    _rel_close(np.asarray(bbox2[0]), ora["rpn_bbox"][0].numpy(), 1e-4,
               "rpn deltas (fused)")


def test_rpn_refine_on_reference_scores(ora):
    """Our proposal layer on the REFERENCE's RPN outputs -> its rois.

    The stage is top-k -> decode -> clip -> NMS. The decode contains
    exp(): torch's SLEEF expf and XLA's expf are BOTH within 1 ulp of
    correctly-rounded but disagree on ~99% of inputs (measured), so
    decoded boxes differ by ~2 ulp and greedy-NMS suppressions whose
    IoU sits within ~1e-7 of the threshold can flip — chaos inherent
    to cross-library fp, not a semantic difference. Deterministic
    sub-parts are asserted EXACTLY and the exp-dependent composition
    with a tolerance:
      1. pre-NMS top-k selection: identical index sequence;
      2. decoded + clipped boxes: atol 1e-3 px (measured ~1.5e-5);
      3. our NMS on the REFERENCE's own boxes+scores: identical keep;
      4. composed proposal set: >= 97% of reference rois present in
         ours within atol 1e-5 (normalized), and vice versa.
    """
    cfg, model = ora["cfg"], ora["model"]
    ref = ora["ref"]
    anchors_np = model.anchors().astype(np.float32)
    anchors = jnp.asarray(anchors_np)
    scores_t = ora["rpn_class"][0][:, 1]
    bbox_t = ora["rpn_bbox"][0]
    a = anchors_np.shape[0]

    # --- reference intermediates (same ops as model.py:1330-1368) ---
    pre = min(500, a)
    s_sorted, order_t = scores_t.sort(descending=True)
    order_t, s_sorted = order_t[:pre], s_sorted[:pre]
    d_t = ref.data.boxes_scale(bbox_t, ora["ref_cfg"].RPN_BBOX_STD_DEV)
    boxes_t = ref.data.boxes_refine(ora["net"].anchors[order_t.data, :],
                                    d_t[order_t.data, :])
    h, w = ora["ref_cfg"].IMAGE_SHAPE[:2]
    ref.data.boxes_clamp_(boxes_t, [0, 0, h, w])
    keep_t = ora["ref"].maskrcnn.nms(
        torch.cat((boxes_t, s_sorted.unsqueeze(1)), 1).data,
        ora["ref_cfg"].RPN_NMS_THRESHOLD)

    # 1. top-k selection order
    _, order_j = jax.jit(lambda s: jax.lax.top_k(s, pre))(
        jnp.asarray(scores_t.numpy()))
    np.testing.assert_array_equal(np.asarray(order_j), order_t.numpy())

    # 2. decode + clip
    from maskrcnn_tpu.ops import boxes as box_ops

    def decode(bb):
        deltas = (bb[order_j].astype(jnp.float32)
                  * jnp.asarray(cfg.RPN_BBOX_STD_DEV, jnp.float32))
        bx = box_ops.refine_boxes(anchors[order_j], deltas)
        return box_ops.clip_boxes(bx, (0.0, 0.0, float(h), float(w)))

    boxes_j = np.asarray(jax.jit(decode)(jnp.asarray(bbox_t.numpy())))
    np.testing.assert_allclose(boxes_j, boxes_t.numpy(), atol=1e-3)

    # 3. NMS on the reference's own boxes: exact keep-set
    from maskrcnn_tpu.ops import nms as nms_ops
    keep_j = np.asarray(jax.jit(
        lambda b: nms_ops.nms_mask_impl(b, jnp.ones((pre,), jnp.bool_),
                                        cfg.RPN_NMS_THRESHOLD,
                                        impl="xla"))(
            jnp.asarray(boxes_t.numpy())))
    np.testing.assert_array_equal(np.where(keep_j)[0],
                                  np.sort(keep_t.numpy()))

    # 4. composed set-match
    proposals, valid = jax.jit(
        lambda s, b: pipeline.rpn_refine_scores(cfg, anchors, s, b))(
            jnp.asarray(scores_t.numpy()), jnp.asarray(bbox_t.numpy()))
    got = np.asarray(proposals)[np.asarray(valid)]
    ref_rois = ora["rois"][0].numpy()
    n_ref, n_got = ref_rois.shape[0], got.shape[0]
    assert abs(n_ref - n_got) <= max(3, 0.03 * n_ref), (n_got, n_ref)

    def coverage(src, dst):
        hit = 0
        for row in src:
            if np.abs(dst - row).max(axis=1).min() <= 1e-5:
                hit += 1
        return hit / len(src)

    cov_ref = coverage(ref_rois, got)
    cov_got = coverage(got, ref_rois)
    assert cov_ref >= 0.97 and cov_got >= 0.97, (cov_ref, cov_got)


def test_box_head_on_reference_rois(ora):
    """Our RoIAlign + box head on the REFERENCE's maps and proposals."""
    cfg, model, params = ora["cfg"], ora["model"], ora["params"]
    feats = [_to_nhwc(m) for m in ora["maps"]]
    rois = jnp.asarray(ora["rois"].numpy())  # [1, N, 4]
    n = rois.shape[1]

    def run(feats, rois):
        pooled = pipeline._pool_rois(feats, rois, cfg.POOL_SIZE,
                                     cfg.IMAGE_SHAPE, impl="xla")
        return model.classify(
            params, pooled.reshape(n, *pooled.shape[2:]))

    _, probs, deltas = jax.jit(run)(feats, rois)
    _rel_close(np.asarray(probs), ora["mrn_probs"].numpy(), 2e-4,
               "box-head class probs")
    _rel_close(np.asarray(deltas), ora["mrn_deltas"].numpy(), 2e-4,
               "box-head deltas")


def test_mrn_refine_on_reference_logits(ora):
    """Our detection refinement on the REFERENCE's box-head outputs.

    Pure-function compare: identical inputs, so class ids and the
    int-rounded boxes must match EXACTLY, scores to fp rounding. This is
    the class-offset multiclass NMS vs the reference's per-class Python
    loop (model.py:1454-1475)."""
    cfg = ora["cfg"]
    n = ora["rois"].shape[1]
    det = jax.jit(lambda p, v, pr, dl, w: pipeline.mrn_refine(
        cfg, p, v, pr, dl, w))(
            jnp.asarray(ora["rois"][0].numpy()),
            jnp.ones((n,), jnp.bool_),
            jnp.asarray(ora["mrn_probs"].numpy()),
            jnp.asarray(ora["mrn_deltas"].numpy()),
            jnp.asarray(ora["window"], jnp.float32))
    valid = np.asarray(det.valid)
    got_ids = np.asarray(det.class_ids)[valid]
    got_scores = np.asarray(det.scores)[valid]
    got_boxes = np.asarray(det.boxes)[valid]

    ref_ids = ora["det_ids"][0].numpy()
    ref_scores = ora["det_scores"][0].numpy()
    ref_boxes = ora["det_boxes"][0].numpy()

    assert got_ids.shape[0] == ref_ids.shape[0], \
        f"detection count {got_ids.shape[0]} != {ref_ids.shape[0]}"
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_array_equal(got_boxes, ref_boxes.astype(np.float32))
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-6)


def test_mask_head_on_reference_detections(ora):
    """Our mask RoIAlign + head on the REFERENCE's final boxes."""
    cfg, model, params = ora["cfg"], ora["model"], ora["params"]
    net = ora["net"]
    feats = [_to_nhwc(m) for m in ora["maps"]]
    ref_boxes = ora["det_boxes"]  # [1, D, 4] int-rounded pixel coords
    d = ref_boxes.shape[1]
    h = DIM

    with torch.no_grad():
        ref_masks = net.mask(ora["maps"][:4],
                             ref_boxes.float() / h)  # [D, 81, 28, 28]
    ref_masks = ref_masks.numpy()
    if ref_masks.ndim == 5:
        ref_masks = ref_masks[0]

    rois = jnp.asarray(ref_boxes.numpy().astype(np.float32) / h)

    def run(feats, rois):
        pooled = pipeline._pool_rois(feats, rois, cfg.MASK_POOL_SIZE,
                                     cfg.IMAGE_SHAPE, impl="xla")
        return model.predict_masks(
            params, pooled.reshape(d, *pooled.shape[2:]))

    got = np.asarray(jax.jit(run)(feats, rois))  # [D, 28, 28, K]
    _rel_close(got.transpose(0, 3, 1, 2), ref_masks, 2e-4, "mask probs")


def _iou(a, b):
    y1 = max(a[0], b[0]); x1 = max(a[1], b[1])
    y2 = min(a[2], b[2]); x2 = min(a[3], b[3])
    inter = max(0.0, y2 - y1) * max(0.0, x2 - x1)
    area = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1])
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def test_end_to_end_predict(ora):
    """Full predict_step vs the reference predict() on the same canvas.

    Drift-tolerant: both stacks accumulate independent fp rounding
    through 101 conv layers, so borderline NMS/score orderings may
    differ; detections are matched by class + IoU >= 0.9 and at least
    90% must match bidirectionally, with matched scores within 1e-3 and
    matched full-canvas masks disagreeing on < 2% of the canvas."""
    cfg, model, params = ora["cfg"], ora["model"], ora["params"]
    net = ora["net"]

    with torch.no_grad():
        ids_t, scores_t, boxes_t, masks_t = net.predict(
            ora["molded_t"], ora["window"])
    ref_ids = ids_t[0].numpy()
    ref_scores = scores_t[0].numpy()
    ref_boxes = boxes_t[0].numpy()
    ref_masks = masks_t[0].numpy().astype(bool)  # [D, H, W]

    out = pipeline.predict_step(
        model, params, jnp.asarray(ora["image"][None]),
        jnp.asarray([ora["window"]], jnp.float32))
    valid = np.asarray(out["valid"][0])
    got_ids = np.asarray(out["class_ids"][0])[valid]
    got_scores = np.asarray(out["scores"][0])[valid]
    got_boxes = np.asarray(out["boxes"][0])[valid]
    got_masks = np.asarray(
        unpack_masks(out["masks_packed"][0], DIM))[valid].astype(bool)

    n_ref, n_got = len(ref_ids), len(got_ids)
    assert abs(n_ref - n_got) <= max(2, 0.1 * max(n_ref, n_got)), \
        f"detection count {n_got} vs reference {n_ref}"

    matched = 0
    mask_bad = []
    used = set()
    for i in range(n_ref):
        best, best_iou = None, 0.0
        for j in range(n_got):
            if j in used or got_ids[j] != ref_ids[i]:
                continue
            iou = _iou(ref_boxes[i], got_boxes[j])
            if iou > best_iou:
                best, best_iou = j, iou
        if best is not None and best_iou >= 0.9:
            used.add(best)
            matched += 1
            assert abs(got_scores[best] - ref_scores[i]) < 1e-3
            disagree = np.mean(got_masks[best] ^ ref_masks[i])
            mask_bad.append(disagree)
    assert matched >= 0.9 * n_ref, f"matched {matched}/{n_ref}"
    if mask_bad:
        assert max(mask_bad) < 0.02, f"mask disagreement {max(mask_bad):.4f}"


def test_end_to_end_trained():
    """Trained-weight e2e golden diff (confident detections, the regime
    where orderings are fp-stable). Heavy: train via
    tools/reference_e2e_golden.py first and point REF_E2E_PARAMS at the
    saved pickle; skipped otherwise. See that tool's docstring for why
    random-weight e2e comparisons are the wrong test."""
    path = os.environ.get("REF_E2E_PARAMS")
    if not path or not os.path.exists(path):
        pytest.skip("REF_E2E_PARAMS not set (run tools/reference_e2e_golden.py)")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import reference_e2e_golden as g
    stats = g.compare(path, n_scenes=4, verbose=True)
    assert sum(st["matched"] for st in stats) > 0
