"""int8 quantization tests (quant.py).

Strategy: the quantized graph shares its traversal with a float "calib"
mode, so (1) asserting the calib forward BIT-EXACT against the tested
flax modules proves the structure, and (2) the int8 numerics are then
bounded against the float forward (cosine/relative-L2), plus an
end-to-end predict_step smoke. Reference behavior being reproduced:
model.py:174-270 (ResNet), 97-168 (FPN), 582-649 (RPN).
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu import quant
from maskrcnn_tpu.checkpoint.fold import fold_bn_params
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.detection.pipeline import predict_step
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.ops.image import normalize_image


@pytest.fixture(scope="module")
def setup():
    cfg = TinyConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # structured calib/test images: gradient + blocks, not pure noise
    yy, xx = np.mgrid[0:128, 0:128]
    base = (yy[..., None] + xx[..., None]) % 256
    imgs = np.stack([base + rng.randint(0, 80, (128, 128, 3)),
                     255 - base + rng.randint(0, 80, (128, 128, 3))])
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    return cfg, model, params, imgs


def test_calib_forward_bit_exact(setup):
    """quant.py's float mode == the flax modules with FOLD_BN=True."""
    cfg, model, params, imgs = setup
    folded = fold_bn_params(params["fpn"])
    model_fold = MaskRCNN(cfg.replace(FOLD_BN=True))
    x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)

    feats_flax = jax.jit(model_fold.backbone)({"fpn": folded}, x)
    dt = jnp.dtype(cfg.COMPUTE_DTYPE)
    feats_calib = jax.jit(lambda fp, x: quant.fpn_forward(
        cfg, quant._Ctx(mode="calib", dtype=dt, fp=fp), x))(folded, x)
    for a, b in zip(feats_flax, feats_calib):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s0, d0 = jax.jit(model_fold.rpn_scores)({"rpn": params["rpn"]},
                                            feats_flax)
    s1, d1 = jax.jit(lambda rp, f: quant.rpn_scores_forward(
        cfg, quant._Ctx(mode="calib", dtype=dt), rp, f))(
            params["rpn"], feats_flax)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_int8_backbone_close_to_float(setup):
    """Pointwise int8 fidelity of the quantization MECHANISM, pinned to
    amax clips: amax is the no-saturation rule, so per-level cosine/L2
    bound the conv/dequant machinery itself. The mse default
    deliberately saturates outlier tails (trading pointwise fidelity at
    the clip for AP — r5 gate) and gets its own correlation bound in
    test_calib_method_percentile_and_mse."""
    cfg, model, params, imgs = setup
    amodel = MaskRCNN(cfg.replace(QUANT_CALIB="amax"))
    qparams = quant.prepare_quant_params(amodel, params, imgs)
    x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)
    feats = jax.jit(model.backbone)(params, x)
    qcfg = cfg.replace(QUANT_INT8=True)
    feats_q = jax.jit(lambda qt, x: quant.quant_backbone(qcfg, qt, x))(
        qparams["quant"], x)
    for lvl, (a, b) in enumerate(zip(feats, feats_q)):
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b, np.float32).ravel()
        cos = float(af @ bf / (np.linalg.norm(af) * np.linalg.norm(bf)))
        rel = float(np.linalg.norm(af - bf) / np.linalg.norm(af))
        assert cos > 0.995, (lvl, cos)
        assert rel < 0.06, (lvl, rel)


def test_int8_param_tree_shapes(setup):
    cfg, model, params, imgs = setup
    qparams = quant.prepare_quant_params(model, params, imgs)
    convs = qparams["quant"]["convs"]
    # resnet50 tiny: 16 bottlenecks x3 + 4 downsamples + 8 fpn + rpn
    # + 4 mask-head convs
    assert len(convs) == 16 * 3 + 4 + 8 + 1 + 4
    for path, e in convs.items():
        assert e["kernel"].dtype == jnp.int8, path
        assert e["kscale"].shape == (e["kernel"].shape[-1],), path
        # every output channel uses the full int8 range after
        # per-channel scaling
        assert int(jnp.max(jnp.abs(e["kernel"].astype(jnp.int32)))) == 127
    acts = qparams["quant"]["acts"]
    assert all(float(v) > 0 for v in acts.values())
    # per-level RPN input scales exist
    for i in range(5):
        assert f"rpn/P{i}" in acts


def test_quant_predict_step_detections_agree(setup):
    """End-to-end: int8 pipeline produces detections consistent with
    the float pipeline on the same inputs (same boxes within a few px
    for detections both paths keep)."""
    cfg, model, params, imgs = setup
    qparams = quant.prepare_quant_params(model, params, imgs)
    windows = jnp.asarray([[0, 0, 128, 128]] * 2, jnp.float32)
    out_f = jax.device_get(predict_step(
        model, params, jnp.asarray(imgs), windows))
    qcfg = cfg.replace(QUANT_INT8=True)
    out_q = jax.device_get(predict_step(
        MaskRCNN(qcfg), qparams, jnp.asarray(imgs), windows))
    assert out_q["boxes"].shape == out_f["boxes"].shape
    assert out_q["masks_packed"].dtype == out_f["masks_packed"].dtype
    # With random-init weights detections are arbitrary, so assert the
    # stage the quantization actually touches: RPN proposal scores.
    x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)
    s_f, _ = jax.jit(model.rpn_scores)(params, jax.jit(model.backbone)(
        params, x))
    qmodel = MaskRCNN(qcfg)
    s_q, _ = jax.jit(qmodel.rpn_scores)(
        qparams, jax.jit(qmodel.backbone)(qparams, x))
    corr = np.corrcoef(np.asarray(s_f).ravel(), np.asarray(s_q).ravel())
    assert corr[0, 1] > 0.99, corr[0, 1]


def test_mask_head_calib_bit_exact(setup):
    """quant.mask_head_forward's float (calib) mode == the flax
    MaskHead with FOLD_BN=True on the same folded params."""
    cfg, model, params, imgs = setup
    folded_mh = fold_bn_params(params["mask_head"])
    c_in = params["mask_head"]["conv1"]["kernel"].shape[2]
    rng = np.random.RandomState(7)
    pooled = jnp.asarray(
        rng.randn(12, cfg.MASK_POOL_SIZE, cfg.MASK_POOL_SIZE, c_in)
        .astype(np.float32))
    model_fold = MaskRCNN(cfg.replace(FOLD_BN=True))
    ref = jax.jit(lambda mh, p: model_fold.mask_head.apply(
        {"params": mh}, p))(folded_mh, pooled)
    dt = jnp.dtype(cfg.COMPUTE_DTYPE)
    got = jax.jit(lambda mh, p: quant.mask_head_forward(
        cfg, quant._Ctx(mode="calib", dtype=dt), p, fp_mh=mh))(
            folded_mh, pooled)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_int8_mask_head_close_to_float(setup):
    """int8 mask conv stack vs float head: mask probabilities stay
    close (they feed the AP-sensitive 0.5 contour)."""
    cfg, model, params, imgs = setup
    qparams = quant.prepare_quant_params(model, params, imgs)
    assert "mask_head/conv1" in qparams["quant"]["convs"]
    assert "mask_head_fp" in qparams["quant"]

    # real pooled features from the float pipeline on the calib images
    from maskrcnn_tpu.detection.pipeline import detect_and_pool_masks
    windows = jnp.asarray([[0, 0, 128, 128]] * 2, jnp.float32)
    _, pooled_m = jax.jit(
        lambda p, im, w: detect_and_pool_masks(model, p, im, w))(
            params, jnp.asarray(imgs), windows)
    b, d = pooled_m.shape[:2]
    pooled = pooled_m.reshape(b * d, *pooled_m.shape[2:])

    probs_f = jax.device_get(model.predict_masks(params, pooled))
    qcfg = cfg.replace(QUANT_INT8=True)
    probs_q = jax.device_get(jax.jit(
        lambda qt, p: quant.quant_mask_head(qcfg, qt, p))(
            qparams["quant"], pooled))
    assert probs_q.shape == probs_f.shape
    af, bf = probs_f.ravel(), probs_q.ravel()
    cos = float(af @ bf / (np.linalg.norm(af) * np.linalg.norm(bf)))
    assert cos > 0.995, cos
    # the binarized masks (the quantity COCO eval consumes) agree on
    # almost all pixels
    disagree = np.mean((probs_f > 0.5) != (probs_q > 0.5))
    assert disagree < 0.02, disagree


def test_stale_stats_fall_back_to_float_mask_head(setup):
    """act_stats persisted before head calibration existed (no
    mask_head keys) must still produce a working tree: backbone int8,
    mask head float."""
    cfg, model, params, imgs = setup
    stats = quant.calibrate(model, params, imgs, heads=False)
    qparams = quant.prepare_quant_params(model, params, act_stats=stats)
    assert "mask_head/conv1" not in qparams["quant"]["convs"]
    assert "mask_head_fp" not in qparams["quant"]
    qcfg = cfg.replace(QUANT_INT8=True)
    windows = jnp.asarray([[0, 0, 128, 128]] * 2, jnp.float32)
    out = jax.device_get(predict_step(
        MaskRCNN(qcfg), qparams, jnp.asarray(imgs), windows))
    assert np.isfinite(out["scores"]).all()


def test_calib_stats_roundtrip(setup, tmp_path):
    """Persisted calibration stats reproduce the quantized tree exactly
    (the serving restart path: Detector(calib_stats_path=...))."""
    import json

    cfg, model, params, imgs = setup
    stats = quant.calibrate(model, params, imgs)
    p = tmp_path / "calib.json"
    p.write_text(json.dumps(stats))
    loaded = json.loads(p.read_text())
    q1 = quant.prepare_quant_params(model, params, imgs)
    q2 = quant.prepare_quant_params(model, params, act_stats=loaded)
    a1 = jax.device_get(q1["quant"]["acts"])
    a2 = jax.device_get(q2["quant"]["acts"])
    assert set(a1) == set(a2)
    for k in a1:
        np.testing.assert_allclose(a1[k], a2[k], rtol=1e-6)


def test_calib_cache_invalidated_on_different_weights(setup, tmp_path):
    """A persisted stats file calibrated on one set of weights must not
    be reused for different weights (the init-then-load_weights flow)."""
    import json

    from maskrcnn_tpu.api import Detector

    cfg, model, params, imgs = setup
    qcfg = cfg.replace(QUANT_INT8=True)
    path = str(tmp_path / "calib.json")
    d1 = Detector(qcfg, params=jax.device_get(params), calib_images=imgs,
                  calib_stats_path=path)
    d1.params  # lazy: calibration runs on first use
    blob1 = json.loads(open(path).read())
    assert len(blob1) == 1

    params2 = model.init(jax.random.PRNGKey(7))   # different weights
    d2 = Detector(qcfg, params=jax.device_get(params2),
                  calib_images=imgs, calib_stats_path=path)
    d2.params
    blob2 = json.loads(open(path).read())
    # the map keeps BOTH checkpoints' stats under distinct fingerprints
    assert len(blob2) == 2
    (k1,) = blob1.keys()
    assert blob2[k1] == blob1[k1]

    # same weights again -> cache hit, file untouched
    mtime = __import__("os").path.getmtime(path)
    d3 = Detector(qcfg, params=jax.device_get(params2),
                  calib_images=imgs, calib_stats_path=path)
    d3.params
    assert __import__("os").path.getmtime(path) == mtime

    # corrupt file -> treated as a miss, then rewritten atomically
    with open(path, "w") as f:
        f.write("{not json")
    d4 = Detector(qcfg, params=jax.device_get(params2),
                  calib_images=imgs, calib_stats_path=path)
    d4.params
    assert len(json.loads(open(path).read())) == 1


def test_quant_with_dp_mesh(setup):
    """QUANT_INT8 composes with the data-parallel mesh: the quantized
    tree replicates and the batch-sharded predict runs."""
    from maskrcnn_tpu.api import Detector

    cfg, model, params, imgs = setup
    qcfg = cfg.replace(QUANT_INT8=True, NUM_DEVICES=4)
    det = Detector(qcfg, params=jax.device_get(params), calib_images=imgs)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (100, 120, 3), np.uint8)
              for _ in range(6)]
    out = det.detect_batch(frames)
    assert len(out) == 6


class TestRetinaQuant:
    """int8 PTQ for the RetinaNet variant (quant.py retina_* section).

    The retina fold synthesizes biases from BN offsets (the flax module
    has no fold flag), so calib parity is tolerance-based: folding
    k*scale pre-conv vs applying the affine post-conv reorders float
    rounding. The structural guarantee still holds — one traversal
    serves both modes.
    """

    @pytest.fixture(scope="class")
    def rsetup(self):
        from maskrcnn_tpu.models.retina_fpn import RetinaNet
        cfg = TinyConfig()
        net = RetinaNet(cfg)
        params = jax.device_get(jax.jit(net.init)(jax.random.PRNGKey(0)))
        rng = np.random.RandomState(1)
        yy, xx = np.mgrid[0:128, 0:128]
        base = (yy[..., None] + xx[..., None]) % 256
        imgs = np.clip(np.stack([
            base + rng.randint(0, 80, (128, 128, 3)),
            255 - base + rng.randint(0, 80, (128, 128, 3))]),
            0, 255).astype(np.uint8)
        return cfg, net, params, imgs

    def test_calib_matches_flax(self, rsetup):
        cfg, net, params, imgs = rsetup
        x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)
        want_lg, want_dl = jax.jit(net.forward)(params, x)

        folded = quant._fold_retina_tree(params["fpn"],
                                         net.fpn.num_blocks)
        dt = jnp.dtype(cfg.COMPUTE_DTYPE)

        def calib_fwd(folded, head, x):
            ctx = quant._Ctx(mode="calib", dtype=dt, fp=folded)
            feats = quant.retina_fpn_forward(cfg, ctx, x,
                                             net.fpn.num_blocks)
            return quant.retina_head_forward(cfg, ctx, head, feats)

        got_lg, got_dl = jax.jit(calib_fwd)(folded, params["head"], x)
        np.testing.assert_allclose(np.asarray(want_lg),
                                   np.asarray(got_lg),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(want_dl),
                                   np.asarray(got_dl),
                                   rtol=1e-4, atol=1e-4)

    def test_int8_close_and_detect_smoke(self, rsetup):
        cfg, net, params, imgs = rsetup
        qparams = quant.prepare_retina_quant_params(net, params, imgs)
        x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)
        lg_f, dl_f = jax.jit(net.forward)(params, x)
        lg_q, dl_q = jax.jit(functools.partial(
            quant.retina_quant_forward, cfg,
            num_blocks=net.fpn.num_blocks))(
                qparams["quant"], qparams["head"], x)
        corr = np.corrcoef(np.asarray(lg_f).ravel(),
                           np.asarray(lg_q).ravel())[0, 1]
        assert corr > 0.99, corr

        # routed end-to-end one-stage detect
        from maskrcnn_tpu.models.retina_fpn import RetinaNet
        qnet = RetinaNet(cfg.replace(QUANT_INT8=True))
        out = qnet.detect(qparams, x)
        assert out["boxes"].shape[0] == 2
        assert bool(np.all(np.isfinite(np.asarray(out["scores"]))))


def test_quant_with_rect_canvas():
    """QUANT_INT8 composes with IMAGE_CANVAS (the rectangular serving
    protocol measured at 188.8 img/s on v5e — BENCHMARKS.md): per-axis
    geometry flows through calibration, quantization, and predict."""
    cfg = TinyConfig().replace(IMAGE_CANVAS=(64, 128), QUANT_INT8=True)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    calib = rng.randint(0, 255, (2, 64, 128, 3)).astype(np.uint8)
    qparams = quant.prepare_quant_params(model, params, calib)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 128, 3), np.uint8))
    windows = jnp.asarray([[0, 0, 64, 128]] * 2, jnp.float32)
    out = predict_step(model, qparams, imgs, windows)
    assert out["masks_packed"].shape[2:] == (64, 128 // 8)
    assert bool(np.all(np.isfinite(np.asarray(out["scores"]))))


def test_calib_method_percentile_and_mse(setup):
    """QUANT_CALIB percentile/mse return clips <= amax that still give
    a working int8 pipeline with RPN scores correlated to float
    (VERDICT r4 #2: amax calibration collapsed bbox AP75)."""
    cfg, model, params, imgs = setup
    stats_amax = quant.calibrate(MaskRCNN(cfg.replace(
        QUANT_CALIB="amax")), params, imgs)
    for method in ("percentile", "mse"):
        m = MaskRCNN(cfg.replace(QUANT_CALIB=method))
        stats = quant.calibrate(m, params, imgs)
        assert set(stats) == set(stats_amax)
        for k, v in stats.items():
            assert 0 < v <= stats_amax[k] + 1e-6, (method, k, v)
        # at least some tensors actually clip below amax
        tighter = sum(1 for k in stats
                      if stats[k] < 0.999 * stats_amax[k])
        assert tighter >= len(stats) // 4, (method, tighter, len(stats))

        qparams = quant.prepare_quant_params(m, params, act_stats=stats)
        qcfg = cfg.replace(QUANT_INT8=True, QUANT_CALIB=method)
        qmodel = MaskRCNN(qcfg)
        x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)
        s_f, _ = jax.jit(model.rpn_scores)(
            params, jax.jit(model.backbone)(params, x))
        s_q, _ = jax.jit(qmodel.rpn_scores)(
            qparams, jax.jit(qmodel.backbone)(qparams, x))
        corr = np.corrcoef(np.asarray(s_f).ravel(),
                           np.asarray(s_q).ravel())[0, 1]
        # mse must match the amax-grade fidelity bound; percentile is
        # the measured-REJECTED rule (r5 gate: it clips real signal —
        # bbox AP 0.332 vs amax 0.434) kept only as an option, so it
        # gets the looser smoke bound.
        assert corr > (0.99 if method == "mse" else 0.95), (method, corr)


def test_quant_skip_groups(setup):
    """Config.QUANT_SKIP keeps the named stage groups float inside the
    int8 pipeline: skipped convs live in convs_fp, their act scales are
    absent, and skipping EVERY group reproduces the float backbone
    almost exactly (only f32-vs-compute-dtype rounding remains)."""
    cfg, model, params, imgs = setup
    stats = quant.calibrate(model, params, imgs)

    skip_cfg = cfg.replace(QUANT_SKIP=("C4", "C5", "MASK"))
    m = MaskRCNN(skip_cfg)
    qp = quant.prepare_quant_params(m, params, act_stats=stats)
    convs, convs_fp = qp["quant"]["convs"], qp["quant"]["convs_fp"]
    assert any(p.startswith("resnet/C4/") for p in convs_fp)
    assert all(not p.startswith(("resnet/C4/", "resnet/C5/"))
               for p in convs)
    assert "mask_head/conv1" not in convs  # float mask-head routing
    assert all(not k.startswith(("resnet/C4/", "resnet/C5/"))
               for k in qp["quant"]["acts"])
    # pipeline runs under the skip config
    qcfg = skip_cfg.replace(QUANT_INT8=True)
    windows = jnp.asarray([[0, 0, 128, 128]] * 2, jnp.float32)
    out = jax.device_get(predict_step(MaskRCNN(qcfg), qp,
                                      jnp.asarray(imgs), windows))
    assert np.isfinite(out["scores"]).all()

    # skip-all == float backbone (up to compute-dtype rounding)
    all_skip = cfg.replace(
        QUANT_SKIP=("C2", "C3", "C4", "C5", "FPN", "RPN", "MASK"))
    mall = MaskRCNN(all_skip)
    qp_all = quant.prepare_quant_params(mall, params, act_stats=stats)
    assert not qp_all["quant"]["convs"]
    x = normalize_image(jnp.asarray(imgs), cfg.MEAN_PIXEL)
    feats_f = jax.jit(model.backbone)(params, x)
    feats_s = jax.jit(MaskRCNN(all_skip.replace(QUANT_INT8=True))
                      .backbone)(qp_all, x)
    for f, s in zip(feats_f, feats_s):
        np.testing.assert_allclose(np.asarray(f, np.float32),
                                   np.asarray(s, np.float32),
                                   rtol=0.1, atol=0.05)
