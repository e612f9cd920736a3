"""Pallas RoIAlign kernel vs the XLA reference path (interpret mode).

Covers both in-kernel paths (32x40 patch fit + full-width wide), level
routing, out-of-range extrapolation, degenerate boxes, batching, and
both pool sizes. Compiled-mode equivalence is exercised on TPU by
`bench.py '{"ROI_IMPL": "pallas"}'` (max bf16 deviation one ulp).
"""

import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import maskrcnn_tpu.ops.roi_align_pallas as rap  # noqa: E402
from maskrcnn_tpu.ops.roi_align import multilevel_roi_align  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        rap.pl, "pallas_call",
        functools.partial(rap.pl.pallas_call, interpret=True))


def _boxes(rng, n):
    ctr = rng.rand(n, 2) * 0.8 + 0.1
    sz = rng.rand(n, 2) * 0.25 + 0.02
    y1 = np.clip(ctr[:, 0] - sz[:, 0] / 2, 0, 1)
    y2 = np.clip(ctr[:, 0] + sz[:, 0] / 2, 0, 1)
    x1 = np.clip(ctr[:, 1] - sz[:, 1] / 2, 0, 1)
    x2 = np.clip(ctr[:, 1] + sz[:, 1] / 2, 0, 1)
    b = np.stack([y1, x1, y2, x2], 1).astype(np.float32)
    b[0] = [-0.2, -0.2, 0.3, 0.3]     # partially out of range
    b[1] = [0, 0, 0, 0]               # zero (padding) box
    b[2] = [0.1, 0.05, 0.12, 0.95]    # extreme wide -> wide path
    b[3] = [0.05, 0.4, 0.95, 0.44]    # extreme tall -> wide path
    b[4] = [0.9, 0.9, 0.99, 0.999]    # bottom-right corner
    return b


@pytest.mark.parametrize("pool", [7, 14])
def test_matches_xla_path(rng, pool):
    feats = [jnp.asarray(rng.rand(s, s, 128).astype(np.float32))
             for s in (256, 128, 64, 32)]
    boxes = jnp.asarray(_boxes(rng, 40))
    shape = (1024, 1024, 3)
    got = rap.multilevel_roi_align_pallas(feats, boxes, pool, shape)
    want = multilevel_roi_align(feats, boxes, pool, shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_int8_table_matches_dequantized_xla(rng):
    """int8 feature tables + in-kernel per-level dequant scales ==
    the XLA path run on the dequantized features (the int8 RoIAlign
    serving path, detection/pipeline._pool_rois quant_scales)."""
    scales = [np.float32(s) for s in (0.021, 0.017, 0.032, 0.009)]
    q_feats = [jnp.asarray(rng.randint(-127, 128, (2, s, s, 128))
                           .astype(np.int8))
               for s in (256, 128, 64, 32)]
    deq = [f.astype(jnp.float32) * s for f, s in zip(q_feats, scales)]
    boxes = jnp.asarray(np.stack([_boxes(rng, 24),
                                  _boxes(rng, 24)[::-1]]))
    shape = (1024, 1024, 3)
    got = rap.batched_multilevel_roi_align_pallas(
        q_feats, boxes, 7, shape, level_scales=scales,
        out_dtype=jnp.float32)
    assert got.dtype == jnp.float32
    for i in range(2):
        want = multilevel_roi_align([f[i] for f in deq], boxes[i], 7,
                                    shape)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"image {i}")


def test_pool_rois_quant_scales_glue(rng):
    """detection/pipeline._pool_rois(quant_scales=...) — the production
    int8-RoI glue: quantize-with-RPN-scales + in-kernel dequant +
    out_dtype — approximates the float pool within int8 tolerance."""
    from maskrcnn_tpu.detection.pipeline import _pool_rois

    feats = [jnp.asarray((rng.rand(1, s, s, 128) * 2 - 1)
                         .astype(np.float32))
             for s in (256, 128, 64, 32)] + [
        jnp.asarray(rng.rand(1, 16, 16, 128).astype(np.float32))]
    boxes = jnp.asarray(_boxes(rng, 24))[None]
    shape = (1024, 1024, 3)
    scales = [jnp.float32(1.0 / 127.0)] * 4

    got = _pool_rois(feats, boxes, 7, shape, impl="pallas",
                     quant_scales=scales)
    assert got.dtype == feats[0].dtype
    want = _pool_rois(feats, boxes, 7, shape, impl="xla")
    # per-level scale 1/127 on inputs in [-1, 1]: quantization step
    # ~0.008 -> pooled values agree to ~1e-2 absolute
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2)


def test_batched_images_are_independent(rng):
    feats = [jnp.asarray(rng.rand(2, s, s, 128).astype(np.float32))
             for s in (256, 128, 64, 32)]
    boxes = jnp.asarray(np.stack([_boxes(rng, 24),
                                  _boxes(rng, 24)[::-1]]))
    shape = (1024, 1024, 3)
    got = rap.batched_multilevel_roi_align_pallas(feats, boxes, 7, shape)
    for i in range(2):
        want = multilevel_roi_align([f[i] for f in feats], boxes[i], 7,
                                    shape)
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"image {i}")
