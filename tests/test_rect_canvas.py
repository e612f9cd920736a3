"""Rectangular-canvas (Config.IMAGE_CANVAS) tests.

The reference protocol is a square multiple-of-64 canvas
(reference: model.py:978-983, data.py:191-223); IMAGE_CANVAS is a
TPU-serving extension that keeps every geometry op per-axis correct on
non-square canvases. The square default must stay bit-identical.
"""

import jax
import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.codecs import decode_masks, resize_image


def test_image_shape_property():
    cfg = TinyConfig()
    assert cfg.IMAGE_SHAPE == (128, 128, 3)
    rect = TinyConfig(IMAGE_CANVAS=(128, 192))
    assert rect.IMAGE_SHAPE == (128, 192, 3)
    assert rect.BACKBONE_SHAPES[0] == (32, 48)
    with pytest.raises(ValueError):
        _ = TinyConfig(IMAGE_CANVAS=(100, 192)).IMAGE_SHAPE


def test_anchors_cover_rect_canvas():
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN

    cfg = TinyConfig(IMAGE_CANVAS=(128, 192))
    anchors = MaskRCNN(cfg).anchors()
    assert anchors.shape == (cfg.NUM_ANCHORS, 4)
    # anchor centers span the wide axis beyond the square extent
    cx = 0.5 * (anchors[:, 1] + anchors[:, 3])
    assert cx.max() > 128
    cy = 0.5 * (anchors[:, 0] + anchors[:, 2])
    assert cy.max() <= 128 + cfg.BACKBONE_STRIDES[-1]


def test_resize_image_rect_geometry():
    img = np.full((60, 120, 3), 7, np.uint8)
    canvas, window, scale = resize_image(img, 100, 128,
                                         canvas_shape=(128, 192))
    # scale would be 100/60 = 1.667 but 120 * 1.667 = 200 > 192, so the
    # per-axis cap wins: min(128/60, 192/120) = 1.6
    assert scale == pytest.approx(1.6)
    assert canvas.shape == (128, 192, 3)
    assert window == (16, 0, 112, 192)
    assert (canvas[16:112, :, :] == 7).all()
    assert (canvas[:16] == 0).all() and (canvas[112:] == 0).all()


def test_resize_square_default_unchanged(rng):
    """canvas_shape=(D, D) must be bit-identical to the historical
    square path for any input geometry."""
    for _ in range(8):
        h = int(rng.randint(40, 200))
        w = int(rng.randint(40, 200))
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        a = resize_image(img, 100, 128)
        b = resize_image(img, 100, 128, canvas_shape=(128, 128))
        np.testing.assert_array_equal(a[0], b[0])
        assert a[1] == b[1] and a[2] == b[2]


def test_masks_to_original_rect_matches_host_decode(rng):
    """Device mask decode on a 128x192 canvas vs the host PIL path
    (decode_masks is window-driven and already rect-agnostic)."""
    import jax.numpy as jnp

    from maskrcnn_tpu.ops.mask_paste import masks_to_original

    ch, cw = 128, 192
    out_dim = 96
    for trial in range(4):
        oh = int(rng.randint(30, 97))
        ow = int(rng.randint(40, 97))
        img = np.zeros((oh, ow, 3), np.uint8)
        _, window, scale = resize_image(img, min_dim=100, max_dim=ch,
                                        canvas_shape=(ch, cw))
        n = 4
        canvas_masks = np.zeros((n, ch, cw), bool)
        for i in range(n):
            y0 = rng.randint(0, ch - 30)
            x0 = rng.randint(0, cw - 30)
            canvas_masks[i, y0:y0 + rng.randint(8, 60),
                         x0:x0 + rng.randint(8, 60)] = True

        want = decode_masks(canvas_masks, scale, window, oh, ow)
        got = np.asarray(masks_to_original(
            jnp.asarray(canvas_masks), jnp.asarray(window, jnp.float32),
            jnp.asarray(oh), jnp.asarray(ow), out_dim))
        assert got.shape == (n, out_dim, out_dim)
        assert not got[:, oh:, :].any() and not got[:, :, ow:].any()
        disagree = (got[:, :oh, :ow] != want.astype(bool)).mean()
        assert disagree < 0.02, f"trial {trial}: {disagree:.4f}"


def test_rect_detector_end_to_end(rng):
    """Full Detector path on a rectangular canvas: host resize, device
    pipeline, device original-coordinate mask decode."""
    from maskrcnn_tpu.api import Detector

    cfg = TinyConfig(IMAGE_CANVAS=(128, 192),
                     DETECTION_MIN_CONFIDENCE=0.0,
                     ORIG_MASK_CANVAS=192)
    det = Detector(cfg, rng_seed=3)
    img = rng.randint(0, 255, (100, 150, 3)).astype(np.uint8)
    out = det.detect(img)
    class_ids, scores, boxes, masks = out
    if class_ids is None:
        pytest.skip("random weights produced no detections")
    boxes = np.asarray(boxes)
    assert (boxes[:, [0, 2]] >= -1).all() and (boxes[:, [0, 2]] <= 101).all()
    assert (boxes[:, [1, 3]] >= -1).all() and (boxes[:, [1, 3]] <= 151).all()
    masks = np.asarray(masks)
    assert masks.shape[1:] == (100, 150)


def test_rect_train_step(rng):
    """One jitted train step on a rectangular canvas: finite loss."""
    import jax.numpy as jnp

    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)

    cfg = TinyConfig(IMAGE_CANVAS=(128, 192))
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(cfg, 1))
    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, 1e-3, decay_mask(params, regex))
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    _, metrics = train_step(model, (opt, lambda p, _m=tmask: _m), state,
                            batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
