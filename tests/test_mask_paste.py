"""Mask pasting tests against the reference's PIL pipeline as oracle.

The oracle replicates data.py:287-314 full_masks: float mask -> uint8 'L'
image -> PIL bilinear resize to box -> pad -> threshold > 127.
"""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from maskrcnn_tpu.ops.mask_paste import paste_masks


def pil_full_mask(mask28, box, height, width):
    y1, x1, y2, x2 = [int(v) for v in box]
    img = Image.fromarray(mask28 * 255.0).convert("L")
    img = img.resize((x2 - x1, y2 - y1), Image.BILINEAR)
    canvas = np.zeros((height, width), np.uint8)
    canvas[y1:y2, x1:x2] = np.array(img)
    return canvas > 127


def test_paste_matches_pil_upscale(rng):
    h = w = 96
    masks, boxes = [], []
    for _ in range(4):
        m = (rng.rand(28, 28) > 0.5).astype(np.float32)
        # smooth it a bit so edges aren't all on the rounding boundary
        m = 0.25 * (m + np.roll(m, 1, 0) + np.roll(m, 1, 1)
                    + np.roll(m, 1, (0, 1)))
        y1 = rng.randint(0, 20)
        x1 = rng.randint(0, 20)
        bh = rng.randint(40, 70)
        bw = rng.randint(40, 70)
        masks.append(m)
        boxes.append([y1, x1, y1 + bh, x1 + bw])
    masks = np.stack(masks)
    boxes = np.array(boxes, np.float32)

    got = np.asarray(paste_masks(jnp.asarray(masks), jnp.asarray(boxes), h, w))
    for i in range(4):
        want = pil_full_mask(masks[i], boxes[i], h, w)
        # PIL rounds filter output to uint8; allow a thin disagreement band
        # right at the 0.5 iso-contour.
        disagree = (got[i] != want).mean()
        assert disagree < 0.02, f"mask {i}: {disagree:.4f} disagreement"


def test_masks_to_original_matches_host_decode(rng):
    """Device-side original-coordinate mask output vs the host PIL
    decode path (codecs.decode_masks, itself reference-parity with
    data.py:265-284). Covers downscale (scale>1: the PIL antialiased
    triangle filter) and upscale windows."""
    import jax.numpy as jnp

    from maskrcnn_tpu.data.codecs import decode_masks, resize_image
    from maskrcnn_tpu.ops.mask_paste import masks_to_original

    d = 128      # canvas
    out_dim = 96
    for trial in range(6):
        # a real resize geometry: random original size -> canvas window
        oh = int(rng.randint(30, 97))
        ow = int(rng.randint(30, 97))
        img = np.zeros((oh, ow, 3), np.uint8)
        _, window, scale = resize_image(img, min_dim=100, max_dim=d)
        n = 5
        canvas_masks = rng.rand(n, d, d) > 0.6
        # blur-ish blobs: random rectangles are more edge-representative
        for i in range(n):
            canvas_masks[i] = False
            y0, x0 = rng.randint(0, d - 20, 2)
            canvas_masks[i, y0:y0 + rng.randint(8, 60),
                         x0:x0 + rng.randint(8, 60)] = True

        want = decode_masks(canvas_masks, scale, window, oh, ow)
        got = np.asarray(masks_to_original(
            jnp.asarray(canvas_masks), jnp.asarray(window, jnp.float32),
            jnp.asarray(oh), jnp.asarray(ow), out_dim))
        assert got.shape == (n, out_dim, out_dim)
        # nothing outside the original extent
        assert not got[:, oh:, :].any() and not got[:, :, ow:].any()
        crop = got[:, :oh, :ow]
        disagree = (crop != want.astype(bool)).mean()
        # disagreement only on the 0.5 iso-contour (PIL fixed-point
        # filter weights vs float)
        assert disagree < 0.02, f"trial {trial}: {disagree:.4f}"


def test_paste_outside_box_is_false(rng):
    m = np.ones((1, 28, 28), np.float32)
    boxes = np.array([[10, 20, 30, 50]], np.float32)
    out = np.asarray(paste_masks(jnp.asarray(m), jnp.asarray(boxes), 64, 64))
    assert out[0, 10:30, 20:50].all()
    outside = out[0].copy()
    outside[10:30, 20:50] = False
    assert not outside.any()


def test_paste_masks_packed_bit_identical(rng):
    """paste_masks_packed == pack(paste_chunked & valid) bit for bit
    (the fused form predict_step ships; only HBM traffic differs)."""
    import jax
    from maskrcnn_tpu.ops.bits import pack_masks_device
    from maskrcnn_tpu.ops.mask_paste import (paste_masks_chunked,
                                             paste_masks_packed)

    h, w = 96, 104
    n = 11  # exercises the chunk padding (not a multiple of 8)
    masks = jnp.asarray(rng.rand(n, 28, 28).astype(np.float32))
    boxes = []
    for _ in range(n):
        y1, x1 = rng.randint(0, 40, 2)
        boxes.append([y1, x1, y1 + rng.randint(8, 50),
                      x1 + rng.randint(8, 50)])
    boxes = jnp.asarray(np.asarray(boxes, np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.3)

    ref = pack_masks_device(
        paste_masks_chunked(masks, boxes, h, w) & valid[:, None, None])
    got = jax.jit(lambda m, b, v: paste_masks_packed(m, b, v, h, w))(
        masks, boxes, valid)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
