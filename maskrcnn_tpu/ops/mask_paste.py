"""On-device full-image mask pasting.

TPU-native replacement for the reference's per-detection PIL loop
(reference: data.py:287-314 full_masks): select the detected class's
28x28 mask, resize it to the detection box, paste into the full canvas,
and threshold. The reference round-trips every mask through the host
(Image.fromarray / transform.Resize / transform.Pad); here the whole
batch of detections is one dense elementwise pass that never leaves HBM.

Parity notes vs the reference pipeline:
* the reference quantises mask*255 to uint8 before resizing
  (data.py:291-294 convert('L')); we fold that into a floor-quantisation
  before sampling;
* PIL bilinear upscaling maps output pixel centres to input coords via
  (i + 0.5) * in/out - 0.5 with edge clamping — reproduced exactly (for
  the rare box smaller than 28px PIL switches to an area filter; the
  triangle approximation there moves mask edges by <1px);
* the threshold `resized > 127` (data.py:307) becomes `> 127.5` on the
  unrounded float, identical after PIL's round-half-up within half a ULP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def paste_masks(masks: jnp.ndarray,
                boxes: jnp.ndarray,
                height: int,
                width: int) -> jnp.ndarray:
    """Paste per-detection masks into the full image canvas.

    masks: [N, m, m] float in [0, 1] (already class-selected).
    boxes: [N, 4] pixel coords (y1, x1, y2, x2), integral values
        (reference rounds boxes before mask pasting: model.py:1432).
    Returns [N, height, width] bool.
    """
    n, mh, mw = masks.shape
    boxes = boxes.astype(jnp.float32)
    # Emulate uint8 quantisation of convert('L') (data.py:291-294).
    q = jnp.floor(jnp.clip(masks.astype(jnp.float32) * 255.0, 0.0, 255.0))

    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bh = jnp.maximum(y2 - y1, 1.0)
    bw = jnp.maximum(x2 - x1, 1.0)

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)

    # PIL bilinear inverse map, per detection: [N, H] / [N, W].
    my = (ys[None, :] - y1[:, None] + 0.5) * (mh / bh)[:, None] - 0.5
    mx = (xs[None, :] - x1[:, None] + 0.5) * (mw / bw)[:, None] - 0.5

    in_box_y = (ys[None, :] >= y1[:, None]) & (ys[None, :] < y2[:, None])
    in_box_x = (xs[None, :] >= x1[:, None]) & (xs[None, :] < x2[:, None])

    my = jnp.clip(my, 0.0, mh - 1.0)
    mx = jnp.clip(mx, 0.0, mw - 1.0)
    y0 = jnp.floor(my)
    x0 = jnp.floor(mx)
    wy = my - y0
    wx = mx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, mh - 1)
    x1i = jnp.minimum(x0 + 1, mw - 1)

    # Separable bilinear: first blend rows -> [N, H, m], then cols.
    det = jnp.arange(n)[:, None]
    rows0 = q[det, y0]                      # [N, H, m]
    rows1 = q[det, y1i]
    rows = rows0 * (1.0 - wy)[..., None] + rows1 * wy[..., None]

    det3 = jnp.arange(n)[:, None, None]
    h_idx = jnp.arange(height)[None, :, None]
    c0 = rows[det3, h_idx, x0[:, None, :]]  # [N, H, W]
    c1 = rows[det3, h_idx, x1i[:, None, :]]
    val = c0 * (1.0 - wx)[:, None, :] + c1 * wx[:, None, :]

    inside = in_box_y[:, :, None] & in_box_x[:, None, :]
    return (val > 127.5) & inside


def paste_masks_chunked(masks: jnp.ndarray, boxes: jnp.ndarray,
                        height: int, width: int,
                        chunk: int = 8) -> jnp.ndarray:
    """paste_masks in sequential chunks of detections.

    The dense paste allocates [N, H, W] f32 temporaries; at production
    shapes (batch 8 x 50 detections x 1024^2) that is ~5GB of transient
    HBM. Chunking with lax.map caps the peak at chunk x H x W floats
    (~32MB) at the cost of a short sequential loop — the op is
    bandwidth-bound so throughput is unchanged.

    masks: [N, m, m]; boxes: [N, 4]. N must not be huge-prime; any
    remainder is padded internally.
    """
    n = masks.shape[0]
    pad = (-n) % chunk
    if pad:
        masks = jnp.pad(masks, ((0, pad), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
    mc = masks.reshape(-1, chunk, *masks.shape[1:])
    bc = boxes.reshape(-1, chunk, 4)
    out = jax.lax.map(
        lambda args: paste_masks(args[0], args[1], height, width),
        (mc, bc))
    return out.reshape(-1, height, width)[:n]
