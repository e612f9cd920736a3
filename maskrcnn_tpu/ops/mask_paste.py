"""On-device full-image mask pasting.

TPU-native replacement for the reference's per-detection PIL loop
(reference: data.py:287-314 full_masks): select the detected class's
28x28 mask, resize it to the detection box, paste into the full canvas,
and threshold. The reference round-trips every mask through the host
(Image.fromarray / transform.Resize / transform.Pad); here the whole
batch of detections never leaves HBM.

Kernelisation: bilinear resize is separable, so the paste is expressed
as two batched matmuls against one-hot interpolation operators,
    full[n] = Wy[n] @ q[n] @ Wx[n]
with Wy [H, m] / Wx [m, W] carrying the (1-w, w) taps and the box
row/column masking. This runs on the MXU at ~24 GFLOP per 50-detection
image — the naive gather formulation lowered to per-element XLA gathers
and measured 1.1 s/image on v5e; this is >1000x faster.

Parity notes vs the reference pipeline:
* the reference quantises mask*255 to uint8 before resizing
  (data.py:291-294 convert('L')); folded into a floor-quantisation;
* PIL bilinear upscaling maps output pixel centres to input coords via
  (i + 0.5) * in/out - 0.5 with edge clamping — reproduced exactly (for
  the rare box smaller than 28px PIL switches to an area filter; the
  triangle approximation there moves mask edges by <1px);
* the threshold `resized > 127` (data.py:307) becomes `> 127.5` on the
  unrounded float, identical after PIL's round-half-up within half a
  ULP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interp_operator(starts: jnp.ndarray, sizes: jnp.ndarray,
                     out_dim: int, m: int):
    """One-hot bilinear interpolation operator [N, out_dim, m].

    For output coordinate Y (canvas pixels), input coordinate
    my = (Y - start + 0.5) * m / size - 0.5 (PIL half-pixel convention),
    clamped to [0, m-1]; rows outside [start, start+size) are zero.
    op[n, Y, i] = (i == floor(my)) * (1 - frac) + (i == ceil_idx) * frac.
    """
    ys = jnp.arange(out_dim, dtype=jnp.float32)
    sizes = jnp.maximum(sizes, 1.0)
    my = (ys[None, :] - starts[:, None] + 0.5) * (m / sizes)[:, None] - 0.5
    inside = ((ys[None, :] >= starts[:, None])
              & (ys[None, :] < starts[:, None] + sizes[:, None]))
    my = jnp.clip(my, 0.0, m - 1.0)
    i0 = jnp.floor(my)
    frac = my - i0
    i1 = jnp.minimum(i0 + 1.0, m - 1.0)
    taps = jnp.arange(m, dtype=jnp.float32)
    w0 = (taps[None, None, :] == i0[:, :, None]) * (1.0 - frac)[:, :, None]
    w1 = (taps[None, None, :] == i1[:, :, None]) * frac[:, :, None]
    return (w0 + w1) * inside[:, :, None]


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
    wy = _interp_operator(y1, y2 - y1, height, mh)        # [N, H, m]
    wx = _interp_operator(x1, x2 - x1, width, mw)         # [N, W, m]

    rows = jnp.einsum("nym,nmj->nyj", wy, q,
                      preferred_element_type=jnp.float32)  # [N, H, m]
    val = jnp.einsum("nyj,nxj->nyx", rows, wx,
                     preferred_element_type=jnp.float32)   # [N, H, W]
    return val > 127.5


def _pil_resize_operator(top: jnp.ndarray, span: jnp.ndarray,
                         out_size: jnp.ndarray, in_dim: int,
                         out_dim: int) -> jnp.ndarray:
    """[out_dim, in_dim] operator reproducing PIL Image.resize(BILINEAR)
    of canvas[top : top+span] down/up to `out_size` pixels.

    Pillow's bilinear is antialiased on downscale: the triangle filter's
    support scales with the reduction factor and taps are normalised to
    sum 1 (ImagingResampleHorizontal). For output pixel Y:
        center = top + (Y + 0.5) * span / out_size
        w(d) = max(0, 1 - |d + 0.5 - center| / max(span/out_size, 1))
    restricted to taps inside the crop, then row-normalised. Rows with
    Y >= out_size are zero (static out_dim canvas, dynamic out_size).
    top/span/out_size are traced scalars, so one jitted program serves
    every window/original-size combination.
    """
    span = jnp.maximum(span.astype(jnp.float32), 1.0)
    out_size = jnp.maximum(out_size.astype(jnp.float32), 1.0)
    top = top.astype(jnp.float32)
    scale = span / out_size
    fs = jnp.maximum(scale, 1.0)
    ys = jnp.arange(out_dim, dtype=jnp.float32)
    ds = jnp.arange(in_dim, dtype=jnp.float32)
    center = top + (ys + 0.5) * scale           # [out_dim]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(ds[None, :] + 0.5
                                       - center[:, None]) / fs)
    inside = (ds[None, :] >= top) & (ds[None, :] < top + span)
    w = w * inside
    w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w * (ys[:, None] < out_size)


def masks_to_original(canvas_masks: jnp.ndarray, window: jnp.ndarray,
                      orig_h: jnp.ndarray, orig_w: jnp.ndarray,
                      out_dim: int, chunk: int = 8) -> jnp.ndarray:
    """Canvas-space masks -> original-image coordinates, on device.

    Replaces the reference's host loop (data.py:265-284 decode_masks: per
    mask, crop the window then PIL-resize the whole canvas mask to the
    original size and threshold >127) with two batched matmuls per chunk.
    One image: canvas_masks [N, CH, CW] bool (square or rectangular
    canvas), window (top, left, bottom, right), original size
    (orig_h, orig_w) <= out_dim. Returns [N, out_dim, out_dim] bool with
    the mask in rows [:orig_h, :orig_w].
    """
    n, dh, dw = canvas_masks.shape
    window = window.astype(jnp.float32)
    ry = _pil_resize_operator(window[0], window[2] - window[0],
                              orig_h, dh, out_dim)          # [OUT, CH]
    rx = _pil_resize_operator(window[1], window[3] - window[1],
                              orig_w, dw, out_dim)          # [OUT, CW]

    def one_chunk(m):
        v = m.astype(jnp.float32) * 255.0                    # [c, CH, CW]
        rows = jnp.einsum("yd,ndx->nyx", ry, v,
                          preferred_element_type=jnp.float32)
        out = jnp.einsum("nyx,wx->nyw", rows, rx,
                         preferred_element_type=jnp.float32)
        return out > 127.5

    pad = (-n) % chunk
    if pad:
        canvas_masks = jnp.pad(canvas_masks,
                               ((0, pad), (0, 0), (0, 0)))
    mc = canvas_masks.reshape(-1, chunk, dh, dw)
    out = jax.lax.map(one_chunk, mc)
    return out.reshape(-1, out_dim, out_dim)[:n]


def paste_masks_chunked(masks: jnp.ndarray, boxes: jnp.ndarray,
                        height: int, width: int,
                        chunk: int = 8) -> jnp.ndarray:
    """paste_masks in sequential chunks of detections.

    Caps transient HBM at chunk x H x W floats plus the interpolation
    operators (~40MB at chunk=8, 1024^2) — a full batch at once would
    allocate gigabytes. The op is MXU/bandwidth bound, so the short
    lax.map loop costs no throughput.

    masks: [N, m, m]; boxes: [N, 4].
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


def paste_masks_packed(masks: jnp.ndarray, boxes: jnp.ndarray,
                       valid: jnp.ndarray, height: int, width: int,
                       chunk: int = 8) -> jnp.ndarray:
    """paste_masks_chunked with the validity mask and the bit-pack
    fused INTO each chunk, so the full-canvas bool never crosses HBM —
    only the packed uint8 (1/8 the bytes) leaves the loop body. Bit-
    identical to `pack_masks_device(paste_masks_chunked(...) & valid)`
    (asserted in tests/test_mask_paste.py); measured ~2x faster for
    the paste+pack stage at b32 (the stage was canvas-bandwidth-bound).

    masks: [N, m, m]; boxes: [N, 4]; valid: [N] bool.
    Returns [N, height, ceil(width/8)] uint8 (np.unpackbits order).
    """
    from maskrcnn_tpu.ops.bits import pack_masks_device

    n = masks.shape[0]
    pad = (-n) % chunk
    if pad:
        masks = jnp.pad(masks, ((0, pad), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))
    mc = masks.reshape(-1, chunk, *masks.shape[1:])
    bc = boxes.reshape(-1, chunk, 4)
    vc = valid.reshape(-1, chunk)

    def body(args):
        m, b, v = args
        full = paste_masks(m, b, height, width) & v[:, None, None]
        return pack_masks_device(full)

    out = jax.lax.map(body, (mc, bc, vc))
    return out.reshape(-1, height, out.shape[-1])[:n]
