"""In-graph image preprocessing ops.

The reference preprocesses on host (numpy/PIL/scipy: utils.py:42-90
resize_image, data.py:236-243 normalize_image, model.py:1750 mold_image)
and pays a host->device transfer of the full float image every step. Here
normalisation lives inside the jitted graph — the host ships uint8 pixels
(4x less PCIe/ICI traffic) and the subtract/scale fuses into the first
convolution's input pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def normalize_image(image: jnp.ndarray, mean_pixel) -> jnp.ndarray:
    """uint8 RGB [..., H, W, 3] -> float32, mean-subtracted.

    Matches mold_image (reference: model.py:1750-1755) == normalize_image
    (data.py:236-243): pixel value in 0..255 minus per-channel mean.
    """
    mean = jnp.asarray(mean_pixel, jnp.float32)
    return image.astype(jnp.float32) - mean


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
