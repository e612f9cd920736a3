"""High-level inference API: the reference's `model.detect()` surface.

Wraps host preprocessing (PIL parity resize/pad), the jitted device
pipeline, and host-side decode back to original image coordinates
(reference: model.py:1095-1138 detect). Adds what the reference never
had: true batched detection (`detect_batch`) — the reference asserts
batch 1 everywhere.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.data.codecs import decode_boxes, decode_masks, resize_image
from maskrcnn_tpu.detection.pipeline import predict_step
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN


@functools.partial(jax.jit, static_argnums=(4, 5))
def _device_decode_masks(masks_packed, windows, ohs, ows, out_dim,
                         canvas_w):
    """Canvas masks -> original-coordinate masks, fully on device.

    masks_packed: [B, N, CH, CW/8] uint8 (predict_step output);
    windows: [B, 4]; ohs/ows: [B] int32 original sizes (<= out_dim).
    Returns [B, N, out_dim, out_dim/8] packed bits.
    """
    from maskrcnn_tpu.ops.bits import pack_masks_device, unpack_masks
    from maskrcnn_tpu.ops.mask_paste import masks_to_original

    masks = unpack_masks(masks_packed, canvas_w).astype(bool)

    def per_image(m, w, oh, ow):
        return masks_to_original(m, w, oh, ow, out_dim)

    orig = jax.vmap(per_image)(masks, windows, ohs, ows)
    return pack_masks_device(orig)


class Detector:
    """Stateful convenience wrapper around the pure pipeline."""

    def __init__(self, config: Config, params=None, rng_seed: int = 0,
                 calib_images=None, calib_stats_path=None):
        """calib_images: [N, H, W, 3] uint8 canvases used to calibrate
        activation scales when config.QUANT_INT8 is set; pass a handful
        of representative frames (resized+padded to IMAGE_SHAPE). When
        omitted, synthetic gradient canvases are used — fine for
        benchmarking, but real frames give tighter scales.
        calib_stats_path: optional JSON path persisting calibration
        stats across restarts, keyed by a weight fingerprint (a map, so
        stats for several checkpoints coexist) — a fingerprint hit
        skips the calibration forward; misses calibrate and merge into
        the file atomically."""
        self.config = config
        self.model = MaskRCNN(config)
        self._calib_images = calib_images
        self._calib_stats_path = calib_stats_path
        # batch-sharded eval sweeps over a dp mesh (SURVEY section 2.3):
        # with NUM_DEVICES > 1 each detect_batch shards its images over
        # the mesh and XLA runs them in parallel. SP_DEVICES > 1 adds
        # the spatial axis: sp chips cooperate per image (canvas-H
        # sharded backbone — the multi-chip low-latency shape).
        self._mesh = None
        if config.NUM_DEVICES > 1:
            from maskrcnn_tpu.parallel import (make_mesh,
                                               make_parallel_predict)
            self._mesh = make_mesh(config.NUM_DEVICES,
                                   axis=config.MESH_AXIS_DP,
                                   sp=config.SP_DEVICES)
            self._parallel_predict = make_parallel_predict(
                self.model, self._mesh)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(rng_seed))
        # pristine float tree kept as the checkpoint-load template (the
        # prepared tree may be folded/quantized and no longer match)
        self._float_params = params
        self._prepared = None

    @property
    def params(self):
        """Inference param tree, prepared lazily (fold/quantize/
        replicate) on first use: an init-then-load_weights flow never
        pays a wasted calibration of the random init weights."""
        if self._prepared is None:
            self._prepared = self._prepare(self._float_params)
        return self._prepared

    def _load_calib_stats(self, path, fp):
        """Fingerprint-keyed stats map; corrupt/legacy files -> miss."""
        import json
        import os
        if not (path and os.path.exists(path)):
            return None
        try:
            with open(path) as f:
                blob = json.load(f)
            return blob.get(fp)
        except (ValueError, AttributeError):
            return None

    def _store_calib_stats(self, path, fp, stats):
        """Merge into the map and write atomically (temp + rename)."""
        import json
        import os
        import tempfile
        blob = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    loaded = json.load(f)
                if isinstance(loaded, dict):
                    blob = {k: v for k, v in loaded.items()
                            if isinstance(v, dict)}
            except ValueError:
                pass
        blob[fp] = stats
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(
            os.path.abspath(path)), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(blob, f)
        os.replace(tmp, path)

    def _prepare(self, params):
        if self.config.FOLD_BN:
            from maskrcnn_tpu.checkpoint.fold import fold_bn_params
            params = fold_bn_params(params)
        if self.config.QUANT_INT8:
            from maskrcnn_tpu.quant import (calibrate,
                                            default_calib_canvases,
                                            params_fingerprint,
                                            prepare_quant_params)

            # stats are only valid for the weights they were calibrated
            # on — key the cache by a content fingerprint so stats for
            # different checkpoints never cross-contaminate. The clip
            # rule changes the stats' meaning, so it keys too.
            fp = (params_fingerprint(params)
                  + f"|{self.config.QUANT_CALIB}"
                  + (f":{self.config.QUANT_PERCENTILE}"
                     if self.config.QUANT_CALIB == "percentile" else ""))
            path = self._calib_stats_path
            stats = self._load_calib_stats(path, fp)
            if stats is None:
                calib = self._calib_images
                if calib is None:
                    calib = default_calib_canvases(
                        self.config.IMAGE_SHAPE)
                stats = calibrate(self.model, params, calib)
                if path:
                    self._store_calib_stats(path, fp, stats)
            params = prepare_quant_params(self.model, params,
                                          act_stats=stats)
        if self._mesh is not None:
            from maskrcnn_tpu.parallel import replicate
            params = replicate(params, self._mesh)
        return params

    def load_weights(self, path: str, reinit_mismatched: bool = False):
        """Load a .pth or orbax checkpoint. reinit_mismatched=True keeps
        fresh init values for shape-incompatible leaves — the fine-tune
        flow when NUM_CLASSES/NUM_KEYPOINTS differs from the checkpoint
        (docs/CUSTOM_DATASET.md)."""
        from maskrcnn_tpu.checkpoint.store import load_params
        self._float_params = load_params(path, self._float_params,
                                         self.config.BACKBONE,
                                         reinit_mismatched=reinit_mismatched)
        self._prepared = None  # re-prepared lazily for the new weights

    def detect(self, image: np.ndarray):
        """Single image -> (class_ids, scores, boxes, masks) in original
        coords; returns (None, None, None, None) when nothing is found,
        matching the reference contract (model.py:1120-1121). With
        NUM_KEYPOINTS > 0 the tuple gains a 5th element: per-detection
        keypoints [n, K, 3] (y, x, score) in original coords."""
        out = self.detect_batch([image])[0]
        if out is None:
            n = 5 if self.config.NUM_KEYPOINTS > 0 else 4
            return (None,) * n
        return out

    def _run_predict(self, batch: np.ndarray, win: np.ndarray):
        if self._mesh is None:
            return predict_step(self.model, self.params, batch, win)
        # shard over the mesh, padding the batch to a multiple of its
        # data width (the sp axis shards H, not the batch)
        from maskrcnn_tpu.parallel import shard_batch
        b = batch.shape[0]
        data_width = self._mesh.size // dict(self._mesh.shape).get("sp", 1)
        pad = (-b) % data_width
        if pad:
            batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
            win = np.concatenate([win, win[-1:].repeat(pad, 0)])
        sharded = shard_batch({"images": batch, "windows": win},
                              self._mesh)
        out = self._parallel_predict(self.params, sharded["images"],
                                     sharded["windows"])
        return {k: v[:b] for k, v in out.items()} if pad else out

    def detect_batch(self, images: Sequence[np.ndarray]):
        """Batched detection; one device round-trip for all images."""
        handle = self.dispatch_batch(images)
        return self.fetch(handle)

    @staticmethod
    def _canvas_geometry(h, w, min_dim, ch, cw):
        """Window/scale math of data/codecs.resize_image without the
        PIL resample — both paths share one geometry."""
        scale = max(1.0, min_dim / min(h, w))
        if round(h * scale) > ch or round(w * scale) > cw:
            scale = min(ch / h, cw / w)
        nh, nw = ((round(h * scale), round(w * scale))
                  if scale != 1.0 else (h, w))
        top = (ch - nh) // 2
        left = (cw - nw) // 2
        return (top, left, top + nh, left + nw), scale

    def _preprocess(self, images: Sequence[np.ndarray]):
        """Images -> (canvas batch, windows, scales).

        With DEVICE_RESIZE the canvases are produced on device from the
        raw pixels (ops/image.batched_resize_pad — ~3x less h2d traffic,
        no host PIL loop); raw shapes bucket to multiples of 64 so the
        jit cache stays small. Downscale images (or a dp mesh, whose
        shard_batch wants host arrays) fall back to the host PIL path.
        """
        cfg = self.config
        ch, cw = int(cfg.IMAGE_SHAPE[0]), int(cfg.IMAGE_SHAPE[1])
        geoms = [self._canvas_geometry(img.shape[0], img.shape[1],
                                       cfg.IMAGE_MIN_DIM, ch, cw)
                 for img in images]
        windows = [g[0] for g in geoms]
        scales = [g[1] for g in geoms]
        if (cfg.DEVICE_RESIZE and self._mesh is None
                and all(s >= 1.0 for s in scales)):
            from maskrcnn_tpu.ops.image import batched_resize_pad
            hb = -(-max(i.shape[0] for i in images) // 64) * 64
            wb = -(-max(i.shape[1] for i in images) // 64) * 64
            raws = np.zeros((len(images), hb, wb, 3), np.uint8)
            for i, img in enumerate(images):
                raws[i, :img.shape[0], :img.shape[1]] = img
            sizes = np.asarray([img.shape[:2] for img in images],
                               np.int32)
            batch = batched_resize_pad(
                raws, np.asarray(windows, np.int32), sizes, (ch, cw))
        else:
            batch = np.stack([
                resize_image(img, cfg.IMAGE_MIN_DIM, cfg.IMAGE_MAX_DIM,
                             canvas_shape=(ch, cw))[0]
                for img in images])
        return batch, windows, scales

    def dispatch_batch(self, images: Sequence[np.ndarray]):
        """Preprocess + launch the device pipeline WITHOUT blocking.

        JAX dispatch is asynchronous: this returns as soon as the work
        is enqueued on the device, holding device arrays. A serving
        loop can therefore overlap batch N's d2h transfer + host decode
        (`fetch`) with batch N+1's device compute — see
        serving.BatchingDetector's pipelined dispatcher.
        """
        cfg = self.config
        batch, windows, scales = self._preprocess(images)
        win = np.asarray(windows, np.float32)

        if cfg.MATMUL_PRECISION != "default":
            with jax.default_matmul_precision(cfg.MATMUL_PRECISION):
                out = self._run_predict(batch, win)
        else:
            out = self._run_predict(batch, win)

        cw = cfg.IMAGE_SHAPE[1]
        out_dim = cfg.ORIG_MASK_CANVAS
        use_device = (cfg.DEVICE_MASK_DECODE and all(
            max(img.shape[:2]) <= out_dim for img in images))
        if use_device:
            # original-coordinate masks computed on device: the host PIL
            # loop (the reference's ~0.7 s/img bottleneck,
            # data.py:265-284) disappears; only 1-bit masks transfer.
            sizes = np.asarray([img.shape[:2] for img in images],
                               np.int32)
            dev = {k: out[k] for k in (
                "class_ids", "scores", "boxes", "valid")}
            dev["masks_packed"] = _device_decode_masks(
                out["masks_packed"], win, sizes[:, 0], sizes[:, 1],
                out_dim, cw)
        else:
            # full masks travel bit-packed (8x less device->host
            # traffic than bool)
            dev = {k: out[k] for k in (
                "class_ids", "scores", "boxes", "valid", "masks_packed")}
        if "keypoints" in out:  # NUM_KEYPOINTS > 0
            dev["keypoints"] = out["keypoints"]
        return dev, use_device, images, windows, scales

    def fetch(self, handle):
        """Block on a dispatch_batch handle and decode to host results."""
        dev, use_device, images, windows, scales = handle
        cfg = self.config
        cw = cfg.IMAGE_SHAPE[1]
        # The padded [B, D, ...] packed-mask tensor dominates d2h
        # (D slots, few real detections). mrn_refine packs survivors
        # into a PREFIX of the D axis (pipeline.py rank/take), so fetch
        # the small tensors first and pull only the mask slots that can
        # hold a valid detection — on an asymmetric link (bench.py
        # records d2h) this is most of the end-to-end cost.
        small = ["class_ids", "scores", "boxes", "valid"]
        if "keypoints" in dev:
            small.append("keypoints")
        fetched = jax.device_get({k: dev[k] for k in small})
        counts = fetched["valid"].sum(axis=-1).astype(int)
        d_slots = int(dev["masks_packed"].shape[1])
        is_prefix = bool(np.all(
            fetched["valid"] ==
            (np.arange(d_slots)[None, :] < counts[:, None])))
        n = int(counts.max()) if counts.size else 0
        if not is_prefix:  # defensive: never drop a valid mask
            n = d_slots
        packed = (jax.device_get(dev["masks_packed"][:, :n]) if n > 0
                  else np.zeros((len(counts), 0)
                                + dev["masks_packed"].shape[2:],
                                np.uint8))

        def decode_one(i):
            img = images[i]
            valid = fetched["valid"][i]
            if int(valid.sum()) == 0:
                return None
            class_ids = fetched["class_ids"][i][valid].tolist()
            scores = fetched["scores"][i][valid].tolist()
            boxes = decode_boxes(fetched["boxes"][i][valid], scales[i],
                                 windows[i]).tolist()
            # unpack bits per image AFTER the valid slice — unpacking
            # the whole padded batch up front costs seconds at batch 32.
            # `packed` holds only the leading n slots; this image's
            # valid masks are its first counts[i] of them (prefix).
            pi = packed[i][valid[:packed.shape[1]]]
            if use_device:
                oh, ow = img.shape[:2]
                masks = np.unpackbits(pi, axis=-1)[:, :oh, :ow]
            else:
                mf = np.unpackbits(
                    pi, axis=-1)[..., :cw].astype(bool)
                masks = decode_masks(mf, scales[i], windows[i],
                                     img.shape[0], img.shape[1])
            if "keypoints" not in fetched:
                return (class_ids, scores, boxes, masks)
            # keypoint branch on: results gain a 5th element —
            # [n, K, 3] (y, x, score) in original image coords (the
            # boxes' canvas->original transform, minus the box quirk).
            # The device computes keypoints only for the top
            # KEYPOINT_MAX_INSTANCES score-ordered slots; detections
            # beyond that get zero rows.
            kp_dev = fetched["keypoints"][i]     # [min(D, KP_MAX), K, 3]
            kp_rows = kp_dev[valid[:kp_dev.shape[0]]].astype(np.float64)
            kp_rows[..., 0] = ((kp_rows[..., 0] - windows[i][0])
                               / (scales[i] + 1e-5))
            kp_rows[..., 1] = ((kp_rows[..., 1] - windows[i][1])
                               / (scales[i] + 1e-5))
            kp = np.zeros((len(class_ids),) + kp_rows.shape[1:],
                          np.float64)
            kp[:len(kp_rows)] = kp_rows
            return (class_ids, scores, boxes, masks, kp)

        # host decode fallback is PIL-bound (~50 resizes each); PIL and
        # numpy release the GIL, so thread across images to keep pace
        # with the ~130 img/s device pipeline
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(images))) as ex:
            return list(ex.map(decode_one, range(len(images))))
