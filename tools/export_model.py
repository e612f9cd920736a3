#!/usr/bin/env python
"""Export the detection pipeline as an AOT StableHLO artifact + weights.

    python tools/export_model.py --out pipeline.shlo --batch 8
    python tools/export_model.py --out pipeline.shlo --weights w.npz \
        --model mask_rcnn_coco.pth --platforms tpu,cpu
    python tools/export_model.py --out pipeline_int8.shlo --int8 \
        --calib-stats scales.json

A runtime that has ONLY jax installed can then serve it:

    from jax import export
    exp = export.deserialize(open("pipeline.shlo", "rb").read())
    out = exp.call(params, images, windows)   # params from the .npz

See maskrcnn_tpu/export.py for the artifact contract and
tests/test_export.py for the no-model-code round trip.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="artifact path")
    ap.add_argument("--weights", default=None,
                    help="also write the .npz weight sidecar here")
    ap.add_argument("--model", default="",
                    help="weights to load (.pth or orbax dir); random "
                         "init if absent")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--canvas", default=None,
                    help="H,W rectangular canvas (default square "
                         "IMAGE_MAX_DIM)")
    ap.add_argument("--int8", action="store_true",
                    help="export the QUANT_INT8 serving pipeline")
    ap.add_argument("--calib-stats", default=None,
                    help="persisted int8 calibration stats json")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current "
                         "backend)")
    args = ap.parse_args()

    import jax

    from maskrcnn_tpu import export as ex
    from maskrcnn_tpu.config import CocoInferenceConfig
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN

    overrides = {}
    if args.canvas:
        h, w = (int(v) for v in args.canvas.split(","))
        overrides["IMAGE_CANVAS"] = (h, w)
    if args.int8:
        overrides["QUANT_INT8"] = True
    cfg = CocoInferenceConfig(**overrides)
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if args.model and os.path.exists(args.model):
        from maskrcnn_tpu.checkpoint.store import load_params
        params = load_params(args.model, params, cfg.BACKBONE)
        print(f"loaded weights: {args.model}")
    if args.int8:
        from maskrcnn_tpu.api import Detector
        det = Detector(cfg, params=params,
                       calib_stats_path=args.calib_stats)
        params = det.params  # quant-prepared tree
    platforms = args.platforms.split(",") if args.platforms else None

    ex.save_exported(model, params, args.batch, args.out, platforms)
    size = os.path.getsize(args.out)
    print(f"artifact: {args.out} ({size / 1e6:.1f} MB, batch={args.batch}, "
          f"platforms={platforms or 'default'})")
    if args.weights:
        ex.params_to_npz(params, args.weights)
        print(f"weights sidecar: {args.weights} "
              f"({os.path.getsize(args.weights) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
