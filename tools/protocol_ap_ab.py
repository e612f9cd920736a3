#!/usr/bin/env python
"""AP A/B for the opt-in inference protocols (VERDICT r3 item 3).

Round 3 shipped TTA (TTA_HFLIP), Gaussian Soft-NMS
(DETECTION_SOFT_NMS_SIGMA) and Cascade R-CNN (CASCADE_STAGES) with
measured COST but no measured ACCURACY. This tool closes that gap on
the synthetic trained gate (no COCO assets in this environment):
train the flagship 1024px model from scratch on multi-class synthetic
scenes (tests/synthetic_scenes.py — 4 classes, occlusion, iscrowd),
train a second model with the 3-stage cascade, then run the FULL COCO
eval stack on a held-out set under every protocol and report
bbox/segm AP, AP50 and AP75:

    baseline | TTA | soft-NMS 0.5 | TTA+soft | cascade(+its baseline)

Cascades exist to raise high-IoU AP (Cai & Vasconcelos 2018) — the
number to look at is AP75. Recorded results: BENCHMARKS.md "Inference
protocols" table; floors asserted in
tests/test_learning_ap_multiclass.py.

    python tools/protocol_ap_ab.py [--steps 240] [--batch 8] [--limit 16]

~15-25 min on the TPU harness with a warm compile cache.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def train(cfg, args, pool, tag):
    import jax

    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)

    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, args.lr, decay_mask(params, regex))
    oam = (opt, lambda p, _m=tmask: _m)
    state = TrainState(step=np.int32(0), params=params,
                       opt_state=opt.init(params))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = train_step(model, oam, state,
                                    pool[step % len(pool)], k)
        if step % 40 == 0:
            print(f"[{tag}] step {step}: "
                  f"total={float(metrics['total']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    assert np.isfinite(float(metrics["total"]))
    return jax.device_get(state.params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--limit", type=int, default=16,
                    help="held-out eval images")
    ap.add_argument("--json-out", default=None,
                    help="also dump the table as JSON")
    ap.add_argument("--mask-last", action="store_true",
                    help="add a cascade + CASCADE_MASK_LAST arm (mask "
                    "head trained on last-stage boxes)")
    ap.add_argument("--skip-single-protocols", action="store_true",
                    help="only train/eval the cascade arms (A/B against "
                    "previously recorded single-head numbers)")
    ap.add_argument("--skip-cascade", action="store_true",
                    help="skip the cascade training arm")
    ap.add_argument("--int8", action="store_true",
                    help="add a QUANT_INT8 serving-path arm on the "
                    "single-head weights (multi-class int8 accuracy "
                    "evidence; calibrates on training-distribution "
                    "scenes)")
    ap.add_argument("--arms", default=None, metavar="A,B,...",
                    help="only evaluate these single-head arms (subset "
                    "of baseline,tta,tta-no-fusion,soft-nms-0.5,"
                    "tta+soft-nms); cascade arms are governed by "
                    "--skip-cascade/--mask-last")
    ap.add_argument("--save-params", default=None, metavar="DIR",
                    help="pickle each trained arm's params into DIR "
                    "(single.pkl / cascade.pkl / cascade_ml.pkl) so "
                    "later gates — e.g. tools/int8_ablation_gate.py — "
                    "can A/B on identical weights without retraining")
    ap.add_argument("--load-params", default=None, metavar="DIR",
                    help="load previously saved params instead of "
                    "training (missing files fall back to training)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from synthetic_scenes import (make_multiclass_coco_dir,
                                  multiclass_train_batch)

    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.config import CocoInferenceConfig
    from maskrcnn_tpu.data.coco import CocoDataset
    from maskrcnn_tpu.eval.evaluate import evaluate_coco

    cfg = CocoInferenceConfig(DETECTION_MIN_CONFIDENCE=0.0,
                              MAX_GT_INSTANCES=8)

    # device-resident batch pool (see tools/tpu_int8_ap_gate.py: fresh
    # 1024px batches through the dev tunnel would cost 5-10 s/step h2d;
    # a 10-batch pool is plenty for an overfit gate)
    rng = np.random.RandomState(3)
    pool = []
    for _ in range(10):
        b = multiclass_train_batch(rng, cfg, args.batch)
        masks = b.pop("gt_masks")
        b["gt_masks_packed"] = np.packbits(masks, axis=-1)
        pool.append(jax.device_put(b))

    import pickle

    def get_params(tag, fname, train_cfg, wanted):
        if not wanted:
            return None
        if args.load_params:
            p = Path(args.load_params) / fname
            if p.exists():
                with open(p, "rb") as f:
                    print(f"[{tag}] loaded {p}")
                    return pickle.load(f)
        params = train(train_cfg, args, pool, tag)
        if args.save_params:
            Path(args.save_params).mkdir(parents=True, exist_ok=True)
            with open(Path(args.save_params) / fname, "wb") as f:
                pickle.dump(params, f)
            print(f"[{tag}] saved {Path(args.save_params) / fname}")
        return params

    cas = (0.5, 0.6, 0.7)
    params_single = get_params("single", "single.pkl", cfg,
                               not args.skip_single_protocols)
    params_cascade = get_params("cascade", "cascade.pkl",
                                cfg.replace(CASCADE_STAGES=cas),
                                not args.skip_cascade)
    params_ml = get_params("cascade-mask-last", "cascade_ml.pkl",
                           cfg.replace(CASCADE_STAGES=cas,
                                       CASCADE_MASK_LAST=True),
                           args.mask_last)

    with tempfile.TemporaryDirectory() as td:
        root = make_multiclass_coco_dir(Path(td), cfg,
                                        n_images=args.limit)
        ds = CocoDataset(root, "minival", 2014, cfg)

        def run(name, config, params, **det_kw):
            det = Detector(config, params=params, **det_kw)
            out = {}
            for kind in ("bbox", "segm"):
                s = evaluate_coco(det, ds, ds.coco, kind,
                                  limit=args.limit, batch_size=8)
                out[kind] = dict(AP=round(float(s[0]), 3),
                                 AP50=round(float(s[1]), 3),
                                 AP75=round(float(s[2]), 3))
            print(f"{name:18s} bbox {out['bbox']}  segm {out['segm']}",
                  flush=True)
            if args.json_out:  # incremental: survive a harness timeout
                with open(args.json_out, "w") as f:
                    json.dump(dict(results, **{name: out}), f, indent=2)
            return out

        results = {}
        wanted = (set(args.arms.split(",")) if args.arms else None)

        def want(name):
            return wanted is None or name in wanted

        if params_single is not None:
            if want("baseline"):
                results["baseline"] = run("baseline", cfg, params_single)
            if want("tta"):
                results["tta"] = run("tta", cfg.replace(TTA_HFLIP=True),
                                     params_single)
            # round-4 winner-take-all merge on the same weights/data:
            # isolates the round-5 box-fusion fix from everything else
            if want("tta-no-fusion"):
                results["tta-no-fusion"] = run(
                    "tta-no-fusion",
                    cfg.replace(TTA_HFLIP=True, TTA_FUSION_IOU=0.0),
                    params_single)
            if want("soft-nms-0.5"):
                results["soft-nms-0.5"] = run(
                    "soft-nms-0.5",
                    cfg.replace(DETECTION_SOFT_NMS_SIGMA=0.5),
                    params_single)
            if want("tta+soft-nms"):
                results["tta+soft-nms"] = run(
                    "tta+soft-nms",
                    cfg.replace(TTA_HFLIP=True,
                                DETECTION_SOFT_NMS_SIGMA=0.5),
                    params_single)
        if args.int8 and params_single is not None:
            from synthetic_scenes import multiclass_scene
            calib = np.stack([
                multiclass_scene(np.random.RandomState(900 + i),
                                 cfg.IMAGE_MAX_DIM)[0]
                for i in range(4)])
            results["int8-ptq"] = run(
                "int8-ptq", cfg.replace(QUANT_INT8=True),
                params_single, calib_images=calib)
        if params_cascade is not None:
            results["cascade"] = run("cascade",
                                     cfg.replace(CASCADE_STAGES=cas),
                                     params_cascade)
        if params_ml is not None:
            # inference config is identical to the plain cascade (the
            # flag only changes training); the trained weights differ
            results["cascade+mask-last"] = run(
                "cascade+mask-last", cfg.replace(CASCADE_STAGES=cas),
                params_ml)

    print("\n| protocol | bbox AP / AP50 / AP75 | segm AP / AP50 / AP75 |")
    print("|---|---|---|")
    for name, r in results.items():
        b, s = r["bbox"], r["segm"]
        print(f"| {name} | {b['AP']:.3f} / {b['AP50']:.3f} / "
              f"{b['AP75']:.3f} | {s['AP']:.3f} / {s['AP50']:.3f} / "
              f"{s['AP75']:.3f} |")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"saved {args.json_out}")

    # the cascade's reason to exist: high-IoU localization
    if "baseline" in results and "cascade" in results:
        assert results["cascade"]["bbox"]["AP75"] >= \
            results["baseline"]["bbox"]["AP75"] - 0.05, (
                "cascade bbox AP75 regressed vs single head: "
                f"{results['cascade']['bbox']['AP75']} vs "
                f"{results['baseline']['bbox']['AP75']}")
    if "baseline" in results and "int8-ptq" in results:
        assert results["int8-ptq"]["bbox"]["AP50"] >= \
            results["baseline"]["bbox"]["AP50"] - 0.05, (
                "int8 bbox AP50 regressed vs float: "
                f"{results['int8-ptq']['bbox']['AP50']} vs "
                f"{results['baseline']['bbox']['AP50']}")
    print("PASS")


if __name__ == "__main__":
    main()
