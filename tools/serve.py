#!/usr/bin/env python
"""HTTP serving front end for Mask R-CNN (production-serving story).

Dependency-free (http.server + the framework): POST an image, get JSON
detections. Requests are coalesced into device batches by
`maskrcnn_tpu.serving.BatchingDetector`.

    python tools/serve.py [--model weights] [--port 8500] [--tiny]

    POST /detect   body: JPEG/PNG bytes
        -> {"detections": [{"class_id", "class_name", "score",
                            "box": [y1, x1, y2, x2],
                            "mask_rle": {"size", "counts"}}, ...]}
    GET /healthz   -> {"ok": true, "batches": N, "images": M}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_handler(batcher, class_names):
    from http.server import BaseHTTPRequestHandler

    from maskrcnn_tpu.eval import rle as R

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True,
                                 "batches": batcher.batches_run,
                                 "images": batcher.images_run})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._send(404, {"error": "not found"})
                return
            try:
                from PIL import Image
                n = int(self.headers.get("Content-Length", 0))
                img = np.asarray(Image.open(
                    io.BytesIO(self.rfile.read(n))).convert("RGB"))
                class_ids, scores, boxes, masks = batcher.detect(img)
                dets = []
                for i in range(len(class_ids or [])):
                    m = np.asarray(masks[i], np.uint8)
                    enc = R.encode(m)
                    dets.append({
                        "class_id": int(class_ids[i]),
                        "class_name": class_names[int(class_ids[i])]
                        if int(class_ids[i]) < len(class_names) else "",
                        "score": float(scores[i]),
                        "box": [float(v) for v in boxes[i]],
                        "mask_rle": {"size": enc["size"],
                                     "counts": enc["counts"].decode(
                                         "ascii")},
                    })
                self._send(200, {"detections": dets})
            except Exception as e:
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/mask_rcnn_coco.pth")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-delay-ms", type=float, default=10.0)
    ap.add_argument("--tiny", action="store_true",
                    help="TinyConfig (CPU smoke/serving tests)")
    ap.add_argument("--int8", action="store_true",
                    help="int8-PTQ backbone/RPN (quant.py; ~1.2x "
                         "throughput, accuracy gates in BENCHMARKS.md)")
    ap.add_argument("--int8-skip", default=None, metavar="G,G",
                    help="with --int8: stage groups kept float "
                    "(config.QUANT_SKIP). 'C4,C5' is the measured "
                    "high-IoU preset: bbox AP75 0.605 vs 0.388 full-"
                    "int8 for 7%% throughput (BENCHMARKS.md)")
    ap.add_argument("--calib-stats", default=None,
                    help="JSON path persisting int8 calibration stats "
                         "across restarts (written on first launch)")
    args = ap.parse_args()

    from http.server import ThreadingHTTPServer

    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.config import CocoInferenceConfig, TinyConfig
    from maskrcnn_tpu.data.coco import COCO_CLASS_NAMES
    from maskrcnn_tpu.serving import BatchingDetector
    from maskrcnn_tpu.utils.profiler import enable_compile_cache

    enable_compile_cache()
    if args.tiny:
        # CPU smoke mode: the axon TPU plugin force-registers itself and
        # ignores the JAX_PLATFORMS env var; pin via config (same as
        # tests/conftest.py)
        import jax
        jax.config.update("jax_platforms", "cpu")
    # DEVICE_RESIZE: serving ships raw pixels h2d and resizes on the
    # MXU (ops/image.batched_resize_pad); downscale images still take
    # the host PIL path automatically.
    config = TinyConfig(DETECTION_MIN_CONFIDENCE=0.0) if args.tiny \
        else CocoInferenceConfig(DEVICE_RESIZE=True)
    if args.int8:
        config = config.replace(QUANT_INT8=True)
        if args.int8_skip:
            config = config.replace(
                QUANT_SKIP=tuple(args.int8_skip.split(",")))
    det = Detector(config, calib_stats_path=args.calib_stats)
    if os.path.exists(args.model):
        det.load_weights(args.model)
        print(f"loaded {args.model}")
    batcher = BatchingDetector(det, args.max_batch, args.max_delay_ms)

    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port), make_handler(batcher, COCO_CLASS_NAMES))
    print(f"serving on :{args.port} (max_batch={args.max_batch}, "
          f"max_delay={args.max_delay_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
