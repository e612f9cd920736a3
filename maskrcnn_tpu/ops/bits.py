"""Bit packing/unpacking for mask transfer.

The reference ships full float32 gt masks host->device every step
(model.py:1602-1608: [1, G, 1024, 1024] float = ~200MB/image). Here the
host packs binary masks 8-per-byte (np.packbits) and the device unpacks
with shift/mask VPU ops — 32x less PCIe/DCN traffic than the reference,
8x less than uint8.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_masks(masks: np.ndarray) -> np.ndarray:
    """Host: [..., W] {0,1} -> [..., W/8] uint8 (big-endian bit order)."""
    return np.packbits(masks.astype(bool), axis=-1)


def unpack_masks(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """Device: [..., W/8] uint8 -> [..., width] uint8 {0,1}."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], -1)[..., :width]


def pack_masks_device(masks: jnp.ndarray) -> jnp.ndarray:
    """Device: [..., W] bool/{0,1} -> [..., ceil(W/8)] uint8, big-endian
    bit order (np.unpackbits-compatible). Used to ship detection masks
    device->host at 1 bit/pixel."""
    w = masks.shape[-1]
    pad = (-w) % 8
    m = masks.astype(jnp.uint8)
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    m = m.reshape(*m.shape[:-1], -1, 8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint8)
