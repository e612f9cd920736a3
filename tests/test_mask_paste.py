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


def test_paste_outside_box_is_false(rng):
    m = np.ones((1, 28, 28), np.float32)
    boxes = np.array([[10, 20, 30, 50]], np.float32)
    out = np.asarray(paste_masks(jnp.asarray(m), jnp.asarray(boxes), 64, 64))
    assert out[0, 10:30, 20:50].all()
    outside = out[0].copy()
    outside[10:30, 20:50] = False
    assert not outside.any()
