"""Device-side resize+pad (ops/image.batched_resize_pad) vs the host
PIL path (data/codecs.resize_image, reference data.py:191-223).

Parity contract (mirrors DEVICE_MASK_DECODE's): bit-exact at scale 1,
PIL-close (bounded pixel delta from PIL's 8-bit fixed-point filter
coefficients) for upscale, host fallback for downscale.
"""

import numpy as np
import pytest

from maskrcnn_tpu.api import Detector
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.codecs import resize_image
from maskrcnn_tpu.ops.image import batched_resize_pad


def _device_canvas(images, min_dim, ch, cw):
    geoms = [Detector._canvas_geometry(i.shape[0], i.shape[1],
                                       min_dim, ch, cw) for i in images]
    hb = -(-max(i.shape[0] for i in images) // 64) * 64
    wb = -(-max(i.shape[1] for i in images) // 64) * 64
    raws = np.zeros((len(images), hb, wb, 3), np.uint8)
    for i, img in enumerate(images):
        raws[i, :img.shape[0], :img.shape[1]] = img
    windows = np.asarray([g[0] for g in geoms], np.int32)
    sizes = np.asarray([i.shape[:2] for i in images], np.int32)
    out = batched_resize_pad(raws, windows, sizes, (ch, cw))
    return np.asarray(out), geoms


def test_scale1_bit_exact(rng):
    """min side >= MIN_DIM and fits: pure center-pad, must be exact."""
    images = [rng.randint(0, 255, (100, 80, 3), np.uint8),
              rng.randint(0, 255, (128, 96, 3), np.uint8)]
    dev, geoms = _device_canvas(images, 64, 128, 128)
    for img, d, (window, scale) in zip(images, dev, geoms):
        canvas, w_ref, s_ref = resize_image(img, 64, 128,
                                            canvas_shape=(128, 128))
        assert scale == s_ref == 1.0 and tuple(window) == tuple(w_ref)
        np.testing.assert_array_equal(d, canvas)


def test_upscale_close_to_pil(rng):
    """Upscale (the COCO serving case): half-pixel triangle filter ==
    PIL BILINEAR support-1 filter up to its fixed-point quantization."""
    images = [rng.randint(0, 255, (60, 90, 3), np.uint8),
              rng.randint(0, 255, (96, 50, 3), np.uint8)]
    dev, geoms = _device_canvas(images, 128, 256, 256)
    for img, d, (window, scale) in zip(images, dev, geoms):
        canvas, w_ref, s_ref = resize_image(img, 128, 256,
                                            canvas_shape=(256, 256))
        assert scale == s_ref and scale > 1.0
        assert tuple(window) == tuple(w_ref)
        diff = np.abs(d.astype(np.int32) - canvas.astype(np.int32))
        assert diff.max() <= 3, diff.max()
        assert diff.mean() < 0.5, diff.mean()
        # padding region must be exactly zero on both
        top, left, bot, right = window
        d2 = d.copy()
        d2[top:bot, left:right] = 0
        assert d2.sum() == 0


def test_rect_canvas_geometry(rng):
    """Per-axis cap on a rectangular canvas routes through the same
    shared geometry (window/scale identical to the host path)."""
    img = rng.randint(0, 255, (60, 120, 3), np.uint8)
    dev, geoms = _device_canvas([img], 64, 128, 192)
    canvas, w_ref, s_ref = resize_image(img, 64, 999,
                                        canvas_shape=(128, 192))
    assert geoms[0][1] == s_ref and tuple(geoms[0][0]) == tuple(w_ref)
    diff = np.abs(dev[0].astype(np.int32) - canvas.astype(np.int32))
    assert diff.max() <= 3


@pytest.mark.slow
def test_detector_device_resize_matches_host(rng):
    """DEVICE_RESIZE end-to-end: scale-1 inputs give the identical
    canvas, hence bit-identical detections vs the host-resize path."""
    cfg = TinyConfig()
    host = Detector(cfg)
    dev = Detector(cfg.replace(DEVICE_RESIZE=True), params=host.params)
    images = [rng.randint(0, 255, (128, 128, 3), np.uint8)
              for _ in range(2)]
    h_out = host.detect_batch(images)
    d_out = dev.detect_batch(images)
    for h, d in zip(h_out, d_out):
        if h is None:
            assert d is None
            continue
        np.testing.assert_allclose(h[1], d[1], rtol=1e-6)  # scores
        np.testing.assert_allclose(h[2], d[2], rtol=1e-6)  # boxes


def test_downscale_falls_back_to_host(rng):
    """An image larger than the canvas (scale < 1) must take the PIL
    path even with DEVICE_RESIZE on — the device filter would differ."""
    cfg = TinyConfig().replace(DEVICE_RESIZE=True)
    det = Detector.__new__(Detector)
    det.config = cfg
    det._mesh = None
    img = rng.randint(0, 255, (200, 260, 3), np.uint8)
    batch, windows, scales = det._preprocess([img])
    assert scales[0] < 1.0
    canvas, w_ref, s_ref = resize_image(
        img, cfg.IMAGE_MIN_DIM, cfg.IMAGE_MAX_DIM,
        canvas_shape=(int(cfg.IMAGE_SHAPE[0]), int(cfg.IMAGE_SHAPE[1])))
    assert scales[0] == s_ref and tuple(windows[0]) == tuple(w_ref)
    np.testing.assert_array_equal(np.asarray(batch[0]), canvas)
