#!/usr/bin/env python
"""Per-stage device-time breakdown of the detection pipeline.

Times progressively larger prefixes of the pipeline (backbone -> +RPN ->
+proposal NMS -> +box head -> +refine -> +mask head -> +paste), each as
an in-graph fori_loop (see bench.py for why per-dispatch timing is
meaningless through the dev tunnel). Differences between consecutive
prefixes attribute device time to each stage — this is the optimization
worklist for Pallas kernels.

    python benchmarks/breakdown.py [batch] [iters] [config-overrides-json]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main(batch: int = 8, iters: int = 8, overrides=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maskrcnn_tpu.config import CocoInferenceConfig
    from maskrcnn_tpu.detection.pipeline import (_pool_rois, mrn_refine,
                                                 predict_step,
                                                 rpn_refine_scores)
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.ops.image import normalize_image

    config = CocoInferenceConfig(**(overrides or {}))
    model = MaskRCNN(config)
    params = model.init(jax.random.PRNGKey(0))
    h, w = config.IMAGE_SHAPE[:2]
    rng = np.random.RandomState(0)
    if config.QUANT_INT8:
        from maskrcnn_tpu.quant import (default_calib_canvases,
                                        prepare_quant_params)
        calib = default_calib_canvases((h, w), n=2)
        params = prepare_quant_params(model, params, calib, batch_size=2)
    params = jax.device_put(params)
    images = jax.device_put(
        rng.randint(0, 200, (batch, h, w, 3)).astype(np.uint8))
    windows = jax.device_put(
        np.tile([[0.0, 0.0, h, w]], (batch, 1)).astype(np.float32))
    anchors_np = model.anchors()

    def stage_fn(upto: str):
        anchors = jnp.asarray(anchors_np)

        def run(imgs):
            x = normalize_image(imgs, config.MEAN_PIXEL)
            feats = model.backbone(params, x)
            if upto == "backbone":
                return sum(f.sum(dtype=jnp.float32) for f in feats)
            rpn_fg, rpn_bbox = model.rpn_scores(params, feats)
            if upto == "rpn":
                return (rpn_fg.sum(dtype=jnp.float32)
                        + rpn_bbox.sum(dtype=jnp.float32))
            proposals, pvalid = jax.vmap(
                lambda p, b: rpn_refine_scores(config, anchors, p, b))(
                    rpn_fg, rpn_bbox)
            if upto == "proposal_nms":
                return proposals.sum() + pvalid.sum(dtype=jnp.float32)
            # mirror detect_and_pool_masks: production ROI impl routing
            # + int8 feature tables when the quant tree carries scales
            q_scales = None
            if config.QUANT_INT8 and config.QUANT_INT8_ROI \
                    and "quant" in params:
                acts = params["quant"]["acts"]
                if all(f"rpn/P{i}" in acts for i in range(4)):
                    q_scales = [acts[f"rpn/P{i}"] for i in range(4)]
            b, r = proposals.shape[:2]
            pooled = _pool_rois(feats, proposals, config.POOL_SIZE,
                                config.IMAGE_SHAPE,
                                impl=config.ROI_IMPL,
                                quant_scales=q_scales)
            _, probs, deltas = model.classify(
                params, pooled.reshape(b * r, *pooled.shape[2:]))
            probs = probs.reshape(b, r, -1)
            deltas = deltas.reshape(b, r, config.NUM_CLASSES, 4)
            if upto == "box_head":
                return probs.sum() + deltas.sum()
            det = jax.vmap(lambda p, v, pr, dl, win: mrn_refine(
                config, p, v, pr, dl, win))(proposals, pvalid, probs,
                                            deltas, windows)
            if upto == "mrn_refine":
                return det.scores.sum() + det.boxes.sum()
            mask_rois = det.boxes / jnp.asarray([h, w, h, w],
                                                jnp.float32)
            dd = mask_rois.shape[1]
            pooled_m = _pool_rois(feats, mask_rois, config.MASK_POOL_SIZE,
                                  config.IMAGE_SHAPE,
                                  impl=config.ROI_IMPL,
                                  quant_scales=q_scales)
            mask_probs = model.predict_masks(
                params, pooled_m.reshape(b * dd, *pooled_m.shape[2:]))
            mask_probs = mask_probs.reshape(b, dd,
                                            *mask_probs.shape[1:])
            if upto == "mask_head":
                return mask_probs.sum()
            sel = jnp.take_along_axis(
                mask_probs, det.class_ids[:, :, None, None, None],
                axis=-1)[..., 0]
            # exactly what predict_step returns: paste with the valid
            # mask and bit-pack fused per chunk
            from maskrcnn_tpu.ops.mask_paste import paste_masks_packed
            packed = paste_masks_packed(
                sel.reshape(-1, 28, 28), det.boxes.reshape(-1, 4),
                det.valid.reshape(-1), h, w)
            return packed.sum(dtype=jnp.float32)

        @jax.jit
        def loop(imgs):
            def body(i, acc):
                return acc + run(imgs + i.astype(jnp.uint8))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return loop

    # paste+pack is one fused stage now (mask_paste.paste_masks_packed)
    stages = ["backbone", "rpn", "proposal_nms", "box_head",
              "mrn_refine", "mask_head", "paste"]
    prev = 0.0
    print(f"batch={batch} iters={iters}")
    for s in stages:
        loop = stage_fn(s)
        float(loop(images))  # compile + warm
        t0 = time.perf_counter()
        float(loop(images))
        dt = time.perf_counter() - t0
        ms_img = 1e3 * dt / (batch * iters)
        delta = ms_img - prev
        print(f"{s:14s} cumulative {ms_img:8.2f} ms/img   "
              f"stage {delta:8.2f} ms/img", flush=True)
        prev = ms_img

    # ground truth: the real predict_step (what bench.py times), same
    # checksum shape — any delta vs the "pack" prefix is graph-assembly
    # difference, not a stage.
    @jax.jit
    def real_loop(imgs):
        def body(i, acc):
            out = predict_step(model, params, imgs + i.astype(jnp.uint8),
                               windows)
            return (acc + out["scores"].sum()
                    + out["masks_packed"].sum(dtype=jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(real_loop(images))
    t0 = time.perf_counter()
    float(real_loop(images))
    dt = time.perf_counter() - t0
    ms_img = 1e3 * dt / (batch * iters)
    print(f"{'predict_step':14s} cumulative {ms_img:8.2f} ms/img   "
          f"(vs pack prefix {ms_img - prev:+.2f})", flush=True)


if __name__ == "__main__":
    import json
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ov = json.loads(sys.argv[3]) if len(sys.argv) > 3 else None
    main(b, it, ov)
