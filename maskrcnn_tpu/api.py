"""High-level inference API: the reference's `model.detect()` surface.

Wraps host preprocessing (PIL parity resize/pad), the jitted device
pipeline, and host-side decode back to original image coordinates
(reference: model.py:1095-1138 detect). Adds what the reference never
had: true batched detection (`detect_batch`) — the reference asserts
batch 1 everywhere.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.data.codecs import decode_boxes, decode_masks, resize_image
from maskrcnn_tpu.detection.pipeline import predict_step
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN


class Detector:
    """Stateful convenience wrapper around the pure pipeline."""

    def __init__(self, config: Config, params=None, rng_seed: int = 0):
        self.config = config
        self.model = MaskRCNN(config)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(rng_seed))
        self.params = params

    def load_weights(self, path: str):
        from maskrcnn_tpu.checkpoint.store import load_params
        self.params = load_params(path, self.params,
                                  self.config.BACKBONE)

    def detect(self, image: np.ndarray):
        """Single image -> (class_ids, scores, boxes, masks) in original
        coords; returns (None, None, None, None) when nothing is found,
        matching the reference contract (model.py:1120-1121)."""
        out = self.detect_batch([image])[0]
        if out is None:
            return None, None, None, None
        return out

    def detect_batch(self, images: Sequence[np.ndarray]):
        """Batched detection; one device round-trip for all images."""
        cfg = self.config
        canvases, windows, scales = [], [], []
        for img in images:
            canvas, window, scale = resize_image(
                img, cfg.IMAGE_MIN_DIM, cfg.IMAGE_MAX_DIM)
            canvases.append(canvas)
            windows.append(window)
            scales.append(scale)
        batch = np.stack(canvases)
        win = np.asarray(windows, np.float32)

        if cfg.MATMUL_PRECISION != "default":
            with jax.default_matmul_precision(cfg.MATMUL_PRECISION):
                out = predict_step(self.model, self.params, batch, win)
        else:
            out = predict_step(self.model, self.params, batch, win)
        # fetch only what the host needs; full masks travel bit-packed
        # (8x less device->host traffic than bool)
        fetched = jax.device_get({k: out[k] for k in (
            "class_ids", "scores", "boxes", "valid", "masks_packed")})
        d = cfg.IMAGE_MAX_DIM
        masks_full = np.unpackbits(
            fetched["masks_packed"], axis=-1)[..., :d].astype(bool)

        def decode_one(i):
            img = images[i]
            valid = fetched["valid"][i]
            if int(valid.sum()) == 0:
                return None
            class_ids = fetched["class_ids"][i][valid].tolist()
            scores = fetched["scores"][i][valid].tolist()
            boxes = decode_boxes(fetched["boxes"][i][valid], scales[i],
                                 windows[i]).tolist()
            masks = decode_masks(masks_full[i][valid], scales[i],
                                 windows[i], img.shape[0], img.shape[1])
            return (class_ids, scores, boxes, masks)

        # per-image mask decode is PIL-bound (~50 resizes each); PIL
        # releases the GIL, so thread across images to keep pace with
        # the ~100 img/s device pipeline
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(images))) as ex:
            return list(ex.map(decode_one, range(len(images))))
