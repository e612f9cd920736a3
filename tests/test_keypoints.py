"""Keypoint branch tests (no reference equivalent — the Mask R-CNN
paper's third task head, gated by Config.NUM_KEYPOINTS; delldu/MaskRCNN
stops at boxes+masks). Oracles are self-authored numpy implementations
of the paper/Detectron rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.train import losses as L
from maskrcnn_tpu.train.targets import keypoint_targets


def kp_config(**kw):
    """Tiny config with a small keypoint head (4 kp, shallow convs)."""
    return TinyConfig(NUM_KEYPOINTS=4, KEYPOINT_HEAD_CONVS=2,
                      KEYPOINT_HEAD_DIM=32, **kw)


def test_head_shapes_and_param_gating():
    cfg = kp_config()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "kp_head" in params

    pooled = jnp.zeros((3, cfg.MASK_POOL_SIZE, cfg.MASK_POOL_SIZE, 256))
    logits = model.predict_keypoints(params, pooled)
    # deconv x2 then bilinear x2: 14 -> 56 == KEYPOINT_SHAPE
    assert logits.shape == (3, *cfg.KEYPOINT_SHAPE, cfg.NUM_KEYPOINTS)
    assert logits.dtype == jnp.float32

    # disabled -> the param tree is EXACTLY the two-head build's
    # (same rng consumption; fold_in for the kp key guarantees it)
    base = MaskRCNN(TinyConfig()).init(jax.random.PRNGKey(0))
    assert "kp_head" not in base
    on_fpn = jax.tree_util.tree_leaves(params["fpn"])
    off_fpn = jax.tree_util.tree_leaves(base["fpn"])
    for a, b in zip(on_fpn, off_fpn):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keypoint_targets_oracle(rng):
    cfg = kp_config()
    h, w = cfg.IMAGE_SHAPE[:2]
    hh, hw = cfg.KEYPOINT_SHAPE
    t, g, k = 8, cfg.MAX_GT_INSTANCES, cfg.NUM_KEYPOINTS

    rois = np.zeros((t, 4), np.float32)
    for i in range(t):
        y1, x1 = rng.uniform(0, 0.6, 2)
        rois[i] = [y1, x1, y1 + rng.uniform(0.1, 0.39),
                   x1 + rng.uniform(0.1, 0.39)]
    assign = rng.randint(0, g, t).astype(np.int32)
    positive = rng.rand(t) > 0.3
    gt_kp = np.zeros((g, k, 3), np.float32)
    gt_kp[..., 0] = rng.uniform(0, h, (g, k))
    gt_kp[..., 1] = rng.uniform(0, w, (g, k))
    gt_kp[..., 2] = rng.randint(0, 3, (g, k))

    pos, valid = jax.jit(lambda r, a, p, gk: keypoint_targets(
        cfg, r, a, p, gk))(rois, assign, positive, gt_kp)
    pos, valid = np.asarray(pos), np.asarray(valid)

    for i in range(t):
        y1, x1, y2, x2 = rois[i] * [h, w, h, w]
        for j in range(k):
            ky, kx, v = gt_kp[assign[i], j]
            fy = (ky - y1) / (y2 - y1)
            fx = (kx - x1) / (x2 - x1)
            exp_valid = (positive[i] and v > 0
                         and 0 <= fy < 1 and 0 <= fx < 1)
            assert valid[i, j] == exp_valid, (i, j)
            if exp_valid:
                assert pos[i, j] == (int(fy * hh) * hw + int(fx * hw))


def test_keypoint_loss_analytic():
    t, hh, hw, k = 3, 8, 8, 2
    kp_pos = np.array([[5, 12], [0, 63], [7, 7]], np.int32)
    kp_valid = np.array([[1, 1], [1, 0], [0, 0]], bool)

    # uniform logits -> exact log(Hh*Ww) over the 3 valid keypoints
    uniform = jnp.zeros((t, hh, hw, k))
    np.testing.assert_allclose(
        float(L.keypoint_loss(kp_pos, kp_valid, uniform)),
        np.log(hh * hw), rtol=1e-6)

    # a sharp peak at each target -> loss ~ 0
    peaked = np.zeros((t, k, hh * hw), np.float32)
    for i in range(t):
        for j in range(k):
            peaked[i, j, kp_pos[i, j]] = 50.0
    peaked = jnp.moveaxis(peaked.reshape(t, k, hh, hw), 1, -1)
    assert float(L.keypoint_loss(kp_pos, kp_valid, peaked)) < 1e-6

    # nothing valid -> 0 (not nan)
    none = np.zeros((t, k), bool)
    assert float(L.keypoint_loss(kp_pos, none, uniform)) == 0.0


def test_decode_keypoints_roundtrip():
    """A peak planted at heatmap cell (iy, ix) decodes to that cell's
    center inside the box, with the softmax peak as score."""
    from maskrcnn_tpu.detection.pipeline import decode_keypoints

    cfg = kp_config()
    hh, hw = cfg.KEYPOINT_SHAPE
    k = cfg.NUM_KEYPOINTS
    boxes = np.array([[10.0, 20.0, 66.0, 104.0],
                      [0.0, 0.0, 56.0, 56.0]], np.float32)
    valid = np.array([True, False])
    cells = [(3, 50), (0, 0), (55, 55), (31, 7)]

    logits = np.zeros((2, hh, hw, k), np.float32)
    for j, (iy, ix) in enumerate(cells):
        logits[:, iy, ix, j] = 40.0
    out = np.asarray(decode_keypoints(cfg, logits, boxes, valid))
    assert out.shape == (2, k, 3)
    np.testing.assert_array_equal(out[1], 0.0)  # invalid -> zeros
    y1, x1, y2, x2 = boxes[0]
    for j, (iy, ix) in enumerate(cells):
        np.testing.assert_allclose(
            out[0, j, 0], y1 + (iy + 0.5) / hh * (y2 - y1), rtol=1e-5)
        np.testing.assert_allclose(
            out[0, j, 1], x1 + (ix + 0.5) / hw * (x2 - x1), rtol=1e-5)
        assert out[0, j, 2] > 0.99


def test_compute_losses_keypoint_branch(rng):
    """mrn_kp is finite and positive with the branch on, exactly 0.0
    with it off, and gradients reach the keypoint head."""
    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.train.step import compute_losses

    cfg = kp_config()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in next(SyntheticLoader(cfg, 2)).items()}
    assert "gt_keypoints" in batch

    def kp_term(p):
        return compute_losses(model, p, jax.random.PRNGKey(1), batch).mrn_kp

    val, grads = jax.jit(jax.value_and_grad(kp_term))(params)
    assert np.isfinite(float(val)) and float(val) > 0.0
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads["kp_head"]))
    assert gnorm > 0.0

    # branch off: same batch minus keypoints -> mrn_kp exactly 0
    base = MaskRCNN(TinyConfig())
    bparams = base.init(jax.random.PRNGKey(0))
    bbatch = {k: v for k, v in batch.items() if k != "gt_keypoints"}
    losses = jax.jit(lambda p: compute_losses(
        base, p, jax.random.PRNGKey(1), bbatch))(bparams)
    assert float(losses.mrn_kp) == 0.0
    np.testing.assert_allclose(
        float(losses.total),
        sum(float(getattr(losses, f)) for f in
            ("rpn_class", "rpn_box", "mrn_class", "mrn_box", "mrn_mask")),
        rtol=1e-6)


def test_two_head_checkpoint_loads_into_kp_model(tmp_path):
    """Fine-tune-the-new-head flow: a boxes+masks checkpoint loads into
    a keypoint-enabled model; the kp_head keeps its init weights and
    int8 preparation carries it through."""
    from maskrcnn_tpu.checkpoint.store import load_params, save_checkpoint
    from maskrcnn_tpu.quant import default_calib_canvases, prepare_quant_params

    base = MaskRCNN(TinyConfig())
    bparams = base.init(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), bparams, 3, base.config)

    cfg = kp_config()
    kmodel = MaskRCNN(cfg)
    template = kmodel.init(jax.random.PRNGKey(1))
    loaded = load_params(str(tmp_path), template, cfg.BACKBONE)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(loaded["fpn"])[0]),
        np.asarray(jax.tree_util.tree_leaves(bparams["fpn"])[0]))
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(loaded["kp_head"])[0]),
        np.asarray(jax.tree_util.tree_leaves(template["kp_head"])[0]))

    qcfg = kp_config(QUANT_INT8=True)
    qparams = prepare_quant_params(
        MaskRCNN(qcfg), loaded,
        calib_images=default_calib_canvases(qcfg.IMAGE_SHAPE, n=2))
    assert "kp_head" in qparams


# ---------------------------------------------------------------------
# COCO dataset keypoint loading (data/coco.py)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def kp_coco_dir(tmp_path_factory):
    import json

    from PIL import Image

    root = tmp_path_factory.mktemp("kpcoco")
    (root / "annotations").mkdir()
    (root / "val2014").mkdir()
    h, w = 100, 140
    arr = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    Image.fromarray(arr).save(root / "val2014" / "COCO_val2014_000000000001.jpg")
    x, y, bw, bh = 30, 20, 60, 50
    poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
    # 17 keypoints: a diagonal line through the box, COCO (x, y, v)
    kxs = np.linspace(x + 2, x + bw - 2, 17)
    kys = np.linspace(y + 2, y + bh - 2, 17)
    vs = [2] * 17
    vs[3] = 0  # one unlabeled
    flat = [float(t) for p in zip(kxs, kys, vs) for t in p]
    data = {
        "images": [{"id": 1, "height": h, "width": w,
                    "file_name": "COCO_val2014_000000000001.jpg"}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            "segmentation": [poly], "keypoints": flat,
            "num_keypoints": 16,
        }],
        "categories": [{"id": 1, "name": "person"}],
    }
    with open(root / "annotations" / "instances_minival2014.json",
              "w") as f:
        json.dump(data, f)
    return str(root)


def test_coco_dataset_loads_keypoints(kp_coco_dir, monkeypatch):
    from maskrcnn_tpu.data.coco import COCO_KP_HFLIP_PERM, CocoDataset

    cfg = TinyConfig(NUM_KEYPOINTS=17)
    ds = CocoDataset(kp_coco_dir, "minival", 2014, cfg)
    image, cls, boxes, masks, kps = ds.load(0, hflip=False)
    assert kps.shape == (1, 17, 3)
    # internal order (y, x, v): annotation was a diagonal
    np.testing.assert_allclose(kps[0, 0], [22, 32, 2])
    np.testing.assert_allclose(kps[0, 16], [68, 88, 2])
    assert kps[0, 3, 2] == 0

    # forced hflip: x mirrors, left/right partners swap
    import random as _random
    monkeypatch.setattr(_random, "randint", lambda a, b: 1)
    _, _, _, _, kpf = ds.load(0, hflip=True)
    wimg = image.shape[1]
    for i, j in enumerate(COCO_KP_HFLIP_PERM):
        if kps[0, j, 2] > 0:
            np.testing.assert_allclose(kpf[0, i, 1],
                                       wimg - 1 - kps[0, j, 1])
            np.testing.assert_allclose(kpf[0, i, 0], kps[0, j, 0])
        assert kpf[0, i, 2] == kps[0, j, 2]

    # sample(): canvas transform tracks the boxes' transform
    monkeypatch.setattr(_random, "randint", lambda a, b: 0)
    s = ds.sample(0, hflip=False)
    assert s["gt_keypoints"].shape == (cfg.MAX_GT_INSTANCES, 17, 3)
    kc = s["gt_keypoints"][0]
    y1, x1, y2, x2 = s["gt_boxes"][0]
    lab = kc[:, 2] > 0
    assert (kc[lab, 0] >= y1).all() and (kc[lab, 0] <= y2).all()
    assert (kc[lab, 1] >= x1).all() and (kc[lab, 1] <= x2).all()
    np.testing.assert_array_equal(kc[~lab, :2], 0.0)


# ---------------------------------------------------------------------
# OKS evaluation (eval/cocoeval.py iouType="keypoints")
# ---------------------------------------------------------------------

def make_kp_dataset(rng, n_images=6):
    """Synthetic 17-keypoint person dataset + perfect/jittered results.

    Covers: visible + occluded + unlabeled keypoints, a gt with NO
    labeled keypoints (the expanded-box OKS branch AND the
    num_keypoints==0 ignore rule), medium and large areas, a missed gt,
    and junk false positives.
    """
    from maskrcnn_tpu.eval.coco_index import COCO

    images, anns, res = [], [], []
    aid = 1
    for i in range(n_images):
        images.append({"id": i + 1, "height": 400, "width": 500})
        for j in range(2):
            w = float(rng.choice([60, 150]))   # medium / large area
            h = w * 1.2
            x0 = rng.uniform(0, 500 - w)
            y0 = rng.uniform(0, 400 - h)
            kx = rng.uniform(x0, x0 + w, 17)
            ky = rng.uniform(y0, y0 + h, 17)
            v = rng.choice([0, 1, 2], 17, p=[0.2, 0.3, 0.5])
            if (i + j) % 5 == 4:
                v[:] = 0  # unlabeled gt -> ignore region
            flat = [float(t) for p in zip(kx, ky, v) for t in p]
            anns.append({
                "id": aid, "image_id": i + 1, "category_id": 1,
                "bbox": [x0, y0, w, h], "area": w * h, "iscrowd": 0,
                "keypoints": flat, "num_keypoints": int((v > 0).sum()),
            })
            if not (i == 0 and j == 1):  # one missed gt
                jitter = rng.normal(0, 2.0, (17, 2))
                rx = kx + jitter[:, 0]
                ry = ky + jitter[:, 1]
                res.append({
                    "image_id": i + 1, "category_id": 1,
                    "score": float(rng.uniform(0.5, 1.0)),
                    "keypoints": [float(t) for p in
                                  zip(rx, ry, np.ones(17)) for t in p],
                })
            aid += 1
        # junk false positive far from everything
        res.append({
            "image_id": i + 1, "category_id": 1,
            "score": 0.3,
            "keypoints": [float(t) for _ in range(17)
                          for t in (1.0, 1.0, 1)],
        })
    gt = COCO({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "person"}]})
    return gt, res


def test_oks_perfect_keypoints_ap1(rng):
    from maskrcnn_tpu.eval.cocoeval import COCOeval

    gt, _ = make_kp_dataset(rng)
    # perfect results: copy each labeled gt's keypoints
    res = [{"image_id": a["image_id"], "category_id": 1, "score": 0.9,
            "keypoints": list(a["keypoints"])}
           for a in gt.dataset["annotations"] if a["num_keypoints"] > 0]
    dt = gt.loadRes(res)
    ev = COCOeval(gt, dt, "keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    assert ev.stats.shape == (10,)
    np.testing.assert_allclose(ev.stats[0], 1.0)  # OKS AP
    np.testing.assert_allclose(ev.stats[5], 1.0)  # OKS AR


def test_oks_matrix_analytic():
    """One dt/gt pair, two labeled keypoints with known offsets ->
    OKS equals the closed-form mean of the two gaussians."""
    from maskrcnn_tpu.eval.coco_index import COCO
    from maskrcnn_tpu.eval.cocoeval import COCOeval, Params

    sig = Params.KPT_OKS_SIGMAS
    area = 80.0 * 90.0
    gt_kp = [0.0] * 51
    dt_kp = [0.0] * 51
    gt_kp[0:3] = [100.0, 100.0, 2]      # keypoint 0 labeled
    dt_kp[0:3] = [103.0, 104.0, 1]      # offset (3, 4)
    gt_kp[3:6] = [200.0, 150.0, 1]      # keypoint 1 labeled
    dt_kp[3:6] = [200.0, 150.0, 1]      # exact
    gt = COCO({"images": [{"id": 1, "height": 400, "width": 400}],
               "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                                "bbox": [80, 80, 80, 90], "area": area,
                                "iscrowd": 0, "keypoints": gt_kp,
                                "num_keypoints": 2}],
               "categories": [{"id": 1, "name": "person"}]})
    dt = gt.loadRes([{"image_id": 1, "category_id": 1, "score": 0.9,
                      "keypoints": dt_kp}])
    ev = COCOeval(gt, dt, "keypoints")
    ev.params.imgIds = [1]
    ev.evaluate()
    oks = ev.ious[(1, 1)][0, 0]
    e0 = (3.0 ** 2 + 4.0 ** 2) / (2 * sig[0]) ** 2 / area / 2.0
    expected = (np.exp(-e0) + 1.0) / 2.0
    np.testing.assert_allclose(oks, expected, rtol=1e-9)


def test_oks_eval_golden_vs_reference(rng):
    """Full keypoints evaluation golden-diffed against the reference's
    vendored pycocotools (tests/pycocotools_oracle.py)."""
    import copy

    from maskrcnn_tpu.eval.coco_index import COCO as OurCOCO
    from maskrcnn_tpu.eval.cocoeval import COCOeval as OurCOCOeval
    from tests.pycocotools_oracle import load

    ref = load()
    if ref is None:
        pytest.skip("reference cocoapi unavailable")

    gt_ours, res = make_kp_dataset(rng)
    dataset = copy.deepcopy(gt_ours.dataset)

    rgt = ref.COCO()
    rgt.dataset = copy.deepcopy(dataset)
    rgt.createIndex()
    rdt = rgt.loadRes(copy.deepcopy(res))
    rev = ref.COCOeval(rgt, rdt, "keypoints")
    rev.evaluate()
    rev.accumulate()
    rev.summarize()

    odt = gt_ours.loadRes(copy.deepcopy(res))
    oev = OurCOCOeval(gt_ours, odt, "keypoints")
    oev.evaluate()
    oev.accumulate()
    oev.summarize()

    assert np.any(rev.stats > 0), "degenerate scene: no OKS signal"
    np.testing.assert_allclose(oev.stats, rev.stats, rtol=0, atol=1e-12)
    np.testing.assert_allclose(oev.eval["precision"],
                               rev.eval["precision"], atol=1e-12)
    np.testing.assert_allclose(oev.eval["recall"],
                               rev.eval["recall"], atol=1e-12)


@pytest.mark.slow
def test_detector_keypoints_end_to_end():
    """Public API drive: Detector with the keypoint branch returns a
    5-tuple whose keypoints land inside their detection's box in
    ORIGINAL image coordinates (window/scale inverted)."""
    from maskrcnn_tpu.api import Detector

    det = Detector(kp_config())
    img = np.random.RandomState(5).randint(0, 256, (96, 120, 3), np.uint8)
    outs = det.detect_batch([img, img])
    assert len(outs) == 2
    for out in outs:
        if out is None:
            continue
        assert len(out) == 5
        class_ids, scores, boxes, masks, kp = out
        assert kp.shape == (len(class_ids), det.config.NUM_KEYPOINTS, 3)
        for i, (y1, x1, y2, x2) in enumerate(np.asarray(boxes)):
            assert (kp[i, :, 0] >= y1 - 1).all()
            assert (kp[i, :, 0] <= y2 + 1).all()
            assert (kp[i, :, 1] >= x1 - 1).all()
            assert (kp[i, :, 1] <= x2 + 1).all()

@pytest.mark.slow
def test_keypoint_max_instances_truncates():
    """KEYPOINT_MAX_INSTANCES < D: the head runs on the top slots only
    (protocol-exact: detections are packed valid-first in score order)
    and the Detector pads later detections with zero keypoint rows."""
    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.detection.pipeline import predict_step

    cfg = kp_config(KEYPOINT_MAX_INSTANCES=2)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    d = cfg.IMAGE_SHAPE[0]
    images = np.random.RandomState(3).randint(0, 256, (1, d, d, 3),
                                              np.uint8)
    windows = np.asarray([[0, 0, d, d]], np.float32)
    out = jax.device_get(predict_step(model, params, jnp.asarray(images),
                                      jnp.asarray(windows)))
    assert out["keypoints"].shape == (1, 2, cfg.NUM_KEYPOINTS, 3)

    det = Detector(cfg, params=params)
    res = det.detect_batch([images[0]])[0]
    if res is not None:
        kp = res[4]
        assert kp.shape[0] == len(res[0])      # one row per detection
        np.testing.assert_array_equal(kp[2:], 0.0)  # beyond top-2: zeros


@pytest.mark.slow
def test_predict_step_returns_keypoints():
    from maskrcnn_tpu.detection.pipeline import predict_step

    cfg = kp_config()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    d = cfg.IMAGE_SHAPE[0]
    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (2, d, d, 3), np.uint8)
    windows = np.asarray([[0, 0, d, d]] * 2, np.float32)
    out = jax.device_get(predict_step(model, params, jnp.asarray(images),
                                      jnp.asarray(windows)))
    kp = out["keypoints"]
    assert kp.shape == (2, cfg.DETECTION_MAX_INSTANCES,
                        cfg.NUM_KEYPOINTS, 3)
    v = out["valid"]
    # valid detections decode inside their boxes; invalid rows are zeros
    for i in range(2):
        for j in range(cfg.DETECTION_MAX_INSTANCES):
            if not v[i, j]:
                np.testing.assert_array_equal(kp[i, j], 0.0)
                continue
            y1, x1, y2, x2 = out["boxes"][i, j]
            assert (kp[i, j, :, 0] >= y1).all()
            assert (kp[i, j, :, 0] <= y2).all()
            assert (kp[i, j, :, 1] >= x1).all()
            assert (kp[i, j, :, 1] <= x2).all()
            assert (kp[i, j, :, 2] > 0).all()
