"""Spatial partitioning (sp mesh axis): canvas-H sharding.

SURVEY section 2.3 requires the parallelism layer to scale past pure
data parallelism; the sp axis makes groups of chips cooperate per image
by sharding the canvas-H dimension of the images/gt-masks, letting
GSPMD partition every backbone/RPN conv with halo exchanges
(collective-permute) — the standard TPU recipe for high-resolution
detection (divides per-image activation HBM; see BENCHMARKS.md training
section for the 1024px HBM wall it addresses).

Verified here on the CPU mesh: (a) the mesh/spec plumbing, (b) the
compiled train step really partitions spatially (halo collectives
present, not a silent all-gather-and-replicate), and (c) numerics match
the unpartitioned step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.pipeline import SyntheticLoader
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.parallel import (make_mesh, make_parallel_predict,
                                   make_parallel_train_step, replicate,
                                   shard_batch)
from maskrcnn_tpu.parallel.mesh import _batch_spec
from maskrcnn_tpu.train.step import TrainState, make_optimizer, train_step
from maskrcnn_tpu.train.trainer import LAYER_REGEX, decay_mask, trainable_mask


def test_make_mesh_sp_axes():
    mesh = make_mesh(8, sp=2)
    assert mesh.axis_names == ("dp", "sp")
    assert dict(mesh.shape) == {"dp": 4, "sp": 2}
    mesh = make_mesh(8, dcn=2, sp=2)
    assert mesh.axis_names == ("dcn", "dp", "sp")
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "sp": 2}
    with pytest.raises(ValueError):
        make_mesh(6, sp=4)


def test_batch_specs_on_sp_mesh():
    mesh = make_mesh(4, sp=2)
    # images [B, H, W, 3]: H is axis 1; gt masks [B, G, H, W]: axis 2
    assert _batch_spec(mesh, "images", None) == P(("dp",), "sp")
    assert _batch_spec(mesh, "gt_masks", None) == P(("dp",), None, "sp")
    assert _batch_spec(mesh, "gt_masks_packed", None) == \
        P(("dp",), None, "sp")
    assert _batch_spec(mesh, "gt_boxes", None) == P(("dp",))
    # leading accum axis shifts everything right by one
    assert _batch_spec(mesh, "images", None, leading_accum=True) == \
        P(None, ("dp",), "sp")
    # no sp axis -> plain data specs, any key
    mesh1 = make_mesh(4)
    assert _batch_spec(mesh1, "images", None) == P(("dp",))


def test_config_batch_size_with_sp():
    cfg = TinyConfig(NUM_DEVICES=8, IMAGES_PER_DEVICE=2, SP_DEVICES=2)
    assert cfg.BATCH_SIZE == 8  # 8 devices / sp 2 = 4 dp groups x 2


def test_train_step_sp_matches_single_device():
    """(dp=2, sp=2) over 4 virtual devices == unpartitioned step, and
    the compiled module really contains conv halo exchanges."""
    cfg1 = TinyConfig(NUM_DEVICES=2, IMAGES_PER_DEVICE=1)  # batch 2
    model1 = MaskRCNN(cfg1)
    params = model1.init(jax.random.PRNGKey(0))
    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    optimizer = make_optimizer(cfg1, cfg1.LEARNING_RATE,
                               decay_mask(params, regex))
    opt_and_mask = (optimizer, lambda p, _m=tmask: _m)
    batch = next(SyntheticLoader(cfg1, cfg1.BATCH_SIZE))
    key = jax.random.PRNGKey(1)

    state0 = TrainState(step=jnp.int32(0), params=params,
                        opt_state=optimizer.init(params))
    ref_state, ref = train_step(model1, opt_and_mask, state0, batch, key)

    cfg_sp = TinyConfig(NUM_DEVICES=4, IMAGES_PER_DEVICE=1, SP_DEVICES=2)
    assert cfg_sp.BATCH_SIZE == cfg1.BATCH_SIZE
    model_sp = MaskRCNN(cfg_sp)
    mesh = make_mesh(4, sp=cfg_sp.SP_DEVICES)
    pstep = make_parallel_train_step(model_sp, opt_and_mask, mesh)
    state = replicate(TrainState(step=jnp.int32(0), params=params,
                                 opt_state=optimizer.init(params)), mesh)
    sharded = shard_batch(batch, mesh)
    assert sharded["images"].sharding.spec == P(("dp",), "sp")
    keyd = replicate(key, mesh)

    txt = pstep.lower(state, sharded, keyd).compile().as_text()
    # halo exchange is the signature of real spatial conv partitioning;
    # a propagation failure would all-gather the canvas instead and
    # emit none.
    assert txt.count("collective-permute") > 10

    new_state, metrics = pstep(state, sharded, keyd)
    for k, v in ref.items():
        np.testing.assert_allclose(float(metrics[k]), float(v),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    # one step of SGD under sp stays numerically aligned
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    sp_leaves = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    for a, b in zip(ref_leaves, sp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_detector_sp_mesh_pads_to_data_width():
    """Detector on a (dp=2, sp=2) mesh: batches pad to the DATA width
    (2), not the mesh size (4), and results match the unsharded
    Detector — exercising the sp serving shape end-to-end through the
    public API (including the prefix-sliced mask fetch)."""
    from maskrcnn_tpu.api import Detector

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, (96, 128, 3), np.uint8)
            for _ in range(3)]  # 3 % data_width(2) != 0 -> pads to 4

    ref_det = Detector(TinyConfig())
    sp_det = Detector(TinyConfig(NUM_DEVICES=4, SP_DEVICES=2),
                      params=ref_det.params)
    ref = ref_det.detect_batch(imgs)
    out = sp_det.detect_batch(imgs)
    assert len(out) == 3
    for r, o in zip(ref, out):
        assert (r is None) == (o is None)
        if r is None:
            continue
        np.testing.assert_array_equal(r[0], o[0])  # class_ids
        np.testing.assert_allclose(r[1], o[1], atol=1e-3)  # scores
        np.testing.assert_allclose(np.asarray(r[2]), np.asarray(o[2]),
                                   atol=0.5)  # boxes
        assert np.mean(np.asarray(r[3]) != np.asarray(o[3])) < 0.01


@pytest.mark.slow
def test_quant_int8_composes_with_sp():
    """The int8 serving path under spatial partitioning: the quantized
    backbone's int8 convs partition over the sp axis like the float
    ones, and detections match the unpartitioned int8 run."""
    from maskrcnn_tpu.detection.pipeline import predict_step
    from maskrcnn_tpu.quant import (default_calib_canvases,
                                    prepare_quant_params)

    cfg = TinyConfig(QUANT_INT8=True)
    model = MaskRCNN(cfg)
    fparams = model.init(jax.random.PRNGKey(0))
    params = prepare_quant_params(
        model, fparams,
        calib_images=default_calib_canvases(cfg.IMAGE_SHAPE))
    rng = np.random.RandomState(11)
    d = cfg.IMAGE_SHAPE[0]
    images = rng.randint(0, 256, (2, d, d, 3), np.uint8)
    windows = np.asarray([[0, 0, d, d]] * 2, np.float32)

    ref = jax.device_get(predict_step(model, params, jnp.asarray(images),
                                      jnp.asarray(windows)))

    cfg_sp = TinyConfig(QUANT_INT8=True, NUM_DEVICES=4, SP_DEVICES=2)
    mesh = make_mesh(4, sp=2)
    ppredict = make_parallel_predict(MaskRCNN(cfg_sp), mesh)
    out = jax.device_get(ppredict(replicate(params, mesh), images,
                                  windows))
    np.testing.assert_array_equal(out["valid"], ref["valid"])
    v = np.asarray(ref["valid"])
    np.testing.assert_array_equal(out["class_ids"][v], ref["class_ids"][v])
    np.testing.assert_allclose(out["scores"][v], ref["scores"][v],
                               rtol=0, atol=1e-3)


@pytest.mark.slow
def test_predict_sp_matches_single_device():
    """Spatially partitioned inference returns the same detections."""
    from maskrcnn_tpu.detection.pipeline import predict_step

    cfg = TinyConfig(NUM_DEVICES=4, IMAGES_PER_DEVICE=1, SP_DEVICES=2)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    d = cfg.IMAGE_SHAPE[0]
    images = rng.randint(0, 256, (2, d, d, 3), np.uint8)
    windows = np.asarray([[0, 0, d, d]] * 2, np.float32)

    ref = jax.device_get(predict_step(model, params, jnp.asarray(images),
                                      jnp.asarray(windows)))

    mesh = make_mesh(4, sp=2)
    ppredict = make_parallel_predict(model, mesh)
    out = jax.device_get(ppredict(replicate(params, mesh), images, windows))

    np.testing.assert_array_equal(out["valid"], ref["valid"])
    v = np.asarray(ref["valid"])
    np.testing.assert_array_equal(out["class_ids"][v], ref["class_ids"][v])
    np.testing.assert_allclose(out["scores"][v], ref["scores"][v],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(out["boxes"][v], ref["boxes"][v],
                               rtol=0, atol=0.5)
    # pasted masks: tiny conv-reduction-order shifts may flip isolated
    # 0.5-contour pixels
    pm = np.unpackbits(out["masks_packed"][v], axis=-1)
    pr = np.unpackbits(ref["masks_packed"][v], axis=-1)
    assert np.mean(pm != pr) < 0.01
