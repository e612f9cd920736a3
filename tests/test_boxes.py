"""Unit tests for box algebra against independent numpy oracles.

Oracles implement the reference equations (data.py:86-189) directly in
numpy so any transcription error in the JAX ops is caught.
"""

import numpy as np
import jax.numpy as jnp

from maskrcnn_tpu.ops import boxes as B


def np_deltas(b, g):
    h = b[:, 2] - b[:, 0]
    w = b[:, 3] - b[:, 1]
    cy = b[:, 0] + 0.5 * h
    cx = b[:, 1] + 0.5 * w
    gh = g[:, 2] - g[:, 0]
    gw = g[:, 3] - g[:, 1]
    gcy = g[:, 0] + 0.5 * gh
    gcx = g[:, 1] + 0.5 * gw
    return np.stack(
        [(gcy - cy) / h, (gcx - cx) / w, np.log(gh / h), np.log(gw / w)], 1)


def np_iou(b1, b2):
    out = np.zeros((len(b1), len(b2)), np.float32)
    for i in range(len(b1)):
        for j in range(len(b2)):
            y1 = max(b1[i, 0], b2[j, 0])
            x1 = max(b1[i, 1], b2[j, 1])
            y2 = min(b1[i, 2], b2[j, 2])
            x2 = min(b1[i, 3], b2[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            out[i, j] = inter / (a1 + a2 - inter)
    return out


def rand_boxes(rng, n, size=100.0):
    y1 = rng.uniform(0, size * 0.8, n)
    x1 = rng.uniform(0, size * 0.8, n)
    h = rng.uniform(1, size * 0.2, n)
    w = rng.uniform(1, size * 0.2, n)
    return np.stack([y1, x1, y1 + h, x1 + w], 1).astype(np.float32)


def test_deltas_refine_roundtrip(rng):
    b = rand_boxes(rng, 32)
    g = rand_boxes(rng, 32)
    d = B.box_deltas(jnp.asarray(b), jnp.asarray(g))
    # fp32 log/div vs the float64 oracle: allow fp32-level tolerance.
    np.testing.assert_allclose(np.asarray(d), np_deltas(b, g),
                               rtol=1e-3, atol=1e-4)
    # refine(b, deltas(b, g)) == g
    back = B.refine_boxes(jnp.asarray(b), d)
    np.testing.assert_allclose(np.asarray(back), g, rtol=1e-4, atol=1e-3)


def test_iou_matches_oracle(rng):
    b1 = rand_boxes(rng, 17)
    b2 = rand_boxes(rng, 9)
    got = np.asarray(B.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, np_iou(b1, b2), rtol=1e-5, atol=1e-6)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 50.0, 200.0], [10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(B.clip_boxes(b, [0, 0, 100, 100]))
    np.testing.assert_allclose(out, [[0, 0, 50, 100], [10, 10, 20, 20]])


def test_encode_decode_boxes_roundtrip(rng):
    b = rand_boxes(rng, 8)
    enc = B.encode_boxes(jnp.asarray(b), 0.5, 10.0, 20.0)
    dec = np.asarray(B.decode_boxes(enc, 0.5, 10.0, 20.0))
    # Reference decode divides by (scale + 1e-5) (data.py:341): tiny bias.
    np.testing.assert_allclose(dec, b, rtol=1e-4, atol=0.05)


def test_iou_batched_shapes(rng):
    b1 = rand_boxes(rng, 4)
    b2 = rand_boxes(rng, 6)
    out = B.box_iou(jnp.asarray(b1), jnp.asarray(b2))
    assert out.shape == (4, 6)
