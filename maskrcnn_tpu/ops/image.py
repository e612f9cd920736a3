"""In-graph image preprocessing ops.

The reference preprocesses on host (numpy/PIL/scipy: utils.py:42-90
resize_image, data.py:236-243 normalize_image, model.py:1750 mold_image)
and pays a host->device transfer of the full float image every step. Here
normalisation lives inside the jitted graph — the host ships uint8 pixels
(4x less PCIe/ICI traffic) and the subtract/scale fuses into the first
convolution's input pipeline.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import jax


def normalize_image(image: jnp.ndarray, mean_pixel) -> jnp.ndarray:
    """uint8 RGB [..., H, W, 3] -> float32, mean-subtracted.

    Matches mold_image (reference: model.py:1750-1755) == normalize_image
    (data.py:236-243): pixel value in 0..255 minus per-channel mean.
    """
    mean = jnp.asarray(mean_pixel, jnp.float32)
    return image.astype(jnp.float32) - mean


def _axis_resize_matrix(n_out: int, n_src: int, offset, src_len,
                        out_len) -> jnp.ndarray:
    """[n_out, n_src] bilinear-resample matrix for one axis.

    Maps a source axis of traced length `src_len` (stored in a buffer of
    static length n_src, zero-padded) onto the `out_len` pixels starting
    at `offset` of a static n_out-pixel canvas axis; canvas pixels
    outside [offset, offset+out_len) get all-zero rows. Half-pixel
    centers with edge clamp — for upscale this is exactly PIL BILINEAR's
    triangle filter (support 1); at scale 1 the matrix is a one-hot
    placement (bit-exact copy). Downscale (support > 1) is NOT
    reproduced; callers route those images to the host PIL path.
    """
    out = jnp.arange(n_out, dtype=jnp.float32)
    rel = out - offset.astype(jnp.float32)
    src = (rel + 0.5) * (src_len.astype(jnp.float32)
                         / out_len.astype(jnp.float32)) - 0.5
    src = jnp.clip(src, 0.0, src_len.astype(jnp.float32) - 1.0)
    k = jnp.arange(n_src, dtype=jnp.float32)
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - k[None, :]))
    valid = (rel >= 0) & (rel < out_len.astype(jnp.float32))
    return weights * valid[:, None].astype(jnp.float32)


def _resize_pad_one(raw, window, size, canvas_hw):
    ch, cw = canvas_hw
    hb, wb = raw.shape[0], raw.shape[1]
    top, left, bot, right = window[0], window[1], window[2], window[3]
    vmat = _axis_resize_matrix(ch, hb, top, size[0], bot - top)
    hmat = _axis_resize_matrix(cw, wb, left, size[1], right - left)
    rawf = raw.astype(jnp.float32)
    # resize as two small matmuls (MXU work, no gathers); HIGHEST keeps
    # the accumulation in f32 so the final round-to-uint8 is stable
    tmp = jnp.einsum("yk,kwc->ywc", vmat, rawf,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("xw,ywc->yxc", hmat, tmp,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(3,))
def batched_resize_pad(raws: jnp.ndarray, windows: jnp.ndarray,
                       sizes: jnp.ndarray, canvas_hw) -> jnp.ndarray:
    """Device-side batched resize+pad: raw pixels in, canvases out.

    The reference resizes on host with PIL (data.py:191-223) and ships
    the full canvas to the device; here the host ships only the raw
    uint8 pixels (zero-padded top-left into a shared [B, Hb, Wb, 3]
    bucket — typically ~3x less host->device traffic for COCO-sized
    images vs the 1024x1024 canvas) and the resample runs on the MXU as
    two per-image matmuls built from traced scale/window scalars, so one
    compile serves every image geometry in the bucket.

    raws: [B, Hb, Wb, 3] uint8; windows: [B, 4] int32 canvas windows
    (y1, x1, y2, x2); sizes: [B, 2] int32 true (h, w); canvas_hw:
    static (CH, CW). Returns [B, CH, CW, 3] uint8. Exact vs the host
    path at scale 1; for upscale it matches PIL BILINEAR up to PIL's
    8-bit fixed-point coefficient quantization (tests bound the pixel
    delta). Downscale must go through the host path.
    """
    return jax.vmap(lambda r, w, s: _resize_pad_one(r, w, s, canvas_hw))(
        raws, windows, sizes)


def resize_and_pad(image: jnp.ndarray, min_dim: int, max_dim: int):
    """On-device resize+pad to a square canvas (utils.py:42-90 equivalent).

    For eval parity the host PIL path (data/codecs.py) is preferred —
    PIL's area-filtered downscale differs slightly from this bilinear
    resize. This in-graph version exists for throughput-critical serving
    where the source size is static.

    image: [H, W, 3] (any numeric dtype).
    Returns (canvas [max_dim, max_dim, 3] float32, window (y1,x1,y2,x2),
    scale) — window/scale are Python values (static shapes).
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    scale = max(1.0, min_dim / min(h, w))
    if round(max(h, w) * scale) > max_dim:
        scale = max_dim / max(h, w)
    nh, nw = round(h * scale), round(w * scale)
    resized = jax.image.resize(
        image.astype(jnp.float32), (nh, nw, 3), method="bilinear")
    top = (max_dim - nh) // 2
    left = (max_dim - nw) // 2
    canvas = jnp.zeros((max_dim, max_dim, 3), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (top, left, 0))
    return canvas, (top, left, top + nh, left + nw), scale
