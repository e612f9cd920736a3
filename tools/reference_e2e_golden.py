#!/usr/bin/env python
"""Trained end-to-end golden diff against the reference's own model.py.

Random-weight e2e comparisons are meaningless: an untrained 81-way
box head emits near-uniform probs, so argmax classes, NMS orderings
and the final detection set are chaotic functions of last-ulp noise
(both stacks produce disjoint junk; the reference diffed against
ITSELF with one input pixel perturbed by 1 ulp scatters just the
same). The meaningful e2e check needs CONFIDENT detections, which
need trained weights — and no real mask_rcnn_coco.pth exists in this
environment (PARITY.md).

This tool closes that gap with shared synthetic-overfit weights:

1. train: overfit the FULL resnet101 model (the architecture the
   reference hard-codes, model.py:985) at 256x256 on deterministic
   synthetic scenes (red rectangles = class 1, green = class 2)
   until detections are confident; save params.
2. compare: convert the trained params to a torch state dict
   (checkpoint/torch_convert.py — the same converter a real
   mask_rcnn_coco.pth flows through, in reverse), load them into the
   reference's torch MaskRCNN (imported read-only from
   /root/reference with its own compiled NMS/crop kernels), and run
   BOTH stacks end-to-end on held-out scenes: mold -> backbone ->
   RPN -> proposals -> heads -> refine -> full-canvas masks.
   Detections are matched by class + box IoU; scores and masks are
   diffed per match.

Usage:
    python tools/reference_e2e_golden.py              # train + compare
    python tools/reference_e2e_golden.py --params P   # reuse weights
    python tools/reference_e2e_golden.py --steps 300 --lr 2e-3

tests/test_reference_model_golden.py::test_end_to_end_trained runs
the compare phase when REF_E2E_PARAMS points at saved weights.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 256


def scene_config(**overrides):
    from maskrcnn_tpu.config import CocoConfig
    return CocoConfig(IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM,
                      MAX_GT_INSTANCES=4, **overrides)


def make_batch(rng, b, g=4):
    """Red rectangles (class 1) and green ones (class 2) on gray."""
    imgs = np.full((b, DIM, DIM, 3), 30, np.uint8)
    cls = np.zeros((b, g), np.int32)
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, DIM, DIM), np.uint8)
    for i in range(b):
        for j in range(rng.randint(1, 3)):
            y1, x1 = rng.randint(5, int(DIM * 0.55), 2)
            h, w = rng.randint(int(DIM * 0.23), int(DIM * 0.4), 2)
            y2, x2 = min(y1 + h, DIM - 1), min(x1 + w, DIM - 1)
            c = int(rng.randint(1, 3))
            imgs[i, y1:y2, x1:x2] = (220, 40, 40) if c == 1 else (40, 200, 40)
            cls[i, j] = c
            boxes[i, j] = [y1, x1, y2, x2]
            valid[i, j] = True
            masks[i, j, y1:y2, x1:x2] = 1
    return {"images": imgs, "gt_class_ids": cls, "gt_boxes": boxes,
            "gt_masks": masks, "gt_valid": valid}


def train(steps: int, lr: float, batch: int, seed: int, out: str) -> str:
    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import TrainState, make_optimizer, train_step
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)
    from maskrcnn_tpu.utils.profiler import enable_compile_cache

    enable_compile_cache()
    cfg = scene_config()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(seed)

    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, lr, decay_mask(params, regex))
    oam = (opt, lambda p, _m=tmask: _m)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    for step in range(steps):
        key, k = jax.random.split(key)
        state, m = train_step(model, oam, state, make_batch(rng, batch), k)
        if step % max(steps // 10, 1) == 0:
            print(f"step {step}: total={float(m['total']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"trained {steps} steps in {time.time() - t0:.0f}s")

    host = jax.device_get(state.params)
    with open(out, "wb") as f:
        pickle.dump(host, f)
    print(f"params -> {out}")
    return out


def box_iou(a, b):
    yy1, xx1 = max(a[0], b[0]), max(a[1], b[1])
    yy2, xx2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, yy2 - yy1) * max(0.0, xx2 - xx1)
    area = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1])
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def compare(params_path: str, n_scenes: int = 4, seed: int = 77,
            min_match_iou: float = 0.85, verbose: bool = True):
    """Run both stacks on held-out scenes; return per-scene match stats.

    Raises AssertionError on divergence beyond tolerance. Forces CPU for
    the jax side so both stacks run the same arithmetic class; the torch
    reference is CPU-only here anyway.
    """
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    import torch

    # The axon TPU plugin force-registers itself and ignores
    # JAX_PLATFORMS from the environment (same workaround as
    # tests/conftest.py): both stacks must run the same arithmetic
    # class for the tolerances below.
    jax.config.update("jax_platforms", "cpu")

    from tests.reference_oracle import load, make_inference_config
    from maskrcnn_tpu.config import CocoInferenceConfig
    from maskrcnn_tpu.checkpoint.torch_convert import to_torch_state_dict
    from maskrcnn_tpu.detection import pipeline
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.ops.bits import unpack_masks

    ref = load()
    if ref is None:
        raise RuntimeError("reference tree or C toolchain unavailable")

    with open(params_path, "rb") as f:
        params = pickle.load(f)

    cfg = CocoInferenceConfig(
        IMAGE_MIN_DIM=DIM, IMAGE_MAX_DIM=DIM, COMPUTE_DTYPE="float32",
        ROI_IMPL="xla", REMAT_BACKBONE=False,
        DETECTION_MIN_CONFIDENCE=0.7)
    model = MaskRCNN(cfg)

    import tempfile
    ref_cfg = make_inference_config(ref, DIM)
    net = ref.model.MaskRCNN(config=ref_cfg, model_dir=tempfile.mkdtemp())
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in to_torch_state_dict(params, cfg.BACKBONE).items()}
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected[:5]
    net.eval()

    rng = np.random.RandomState(seed)
    window = [0, 0, DIM, DIM]
    stats = []
    for s in range(n_scenes):
        sample = make_batch(rng, 1)
        image = sample["images"][0]

        molded = ref.model.mold_image(image, ref_cfg)
        molded_t = torch.from_numpy(
            molded.transpose(2, 0, 1)).float().unsqueeze(0)
        with torch.no_grad():
            ids_t, scores_t, boxes_t, masks_t = net.predict(molded_t, window)
        ref_ids = ids_t[0].numpy()
        ref_scores = scores_t[0].numpy()
        ref_boxes = boxes_t[0].numpy()
        ref_masks = masks_t[0].numpy().astype(bool)

        out = pipeline.predict_step(
            model, params, jnp.asarray(image[None]),
            jnp.asarray([window], jnp.float32))
        valid = np.asarray(out["valid"][0])
        got_ids = np.asarray(out["class_ids"][0])[valid]
        got_scores = np.asarray(out["scores"][0])[valid]
        got_boxes = np.asarray(out["boxes"][0])[valid]
        got_masks = np.asarray(
            unpack_masks(out["masks_packed"][0], DIM))[valid].astype(bool)

        n_ref, n_got = len(ref_ids), len(got_ids)
        matched, used = 0, set()
        score_diffs, mask_diffs = [], []
        for i in range(n_ref):
            best, best_iou = None, 0.0
            for j in range(n_got):
                if j in used or got_ids[j] != ref_ids[i]:
                    continue
                iou = box_iou(ref_boxes[i], got_boxes[j])
                if iou > best_iou:
                    best, best_iou = j, iou
            if best is not None and best_iou >= min_match_iou:
                used.add(best)
                matched += 1
                score_diffs.append(abs(float(got_scores[best])
                                       - float(ref_scores[i])))
                mask_diffs.append(float(np.mean(
                    got_masks[best] ^ ref_masks[i])))
        stats.append(dict(n_ref=n_ref, n_got=n_got, matched=matched,
                          score_diff=max(score_diffs, default=0.0),
                          mask_diff=max(mask_diffs, default=0.0)))
        if verbose:
            print(f"scene {s}: ref={n_ref} ours={n_got} matched={matched} "
                  f"max|score diff|={stats[-1]['score_diff']:.2e} "
                  f"max mask diff={stats[-1]['mask_diff']:.4f}", flush=True)

    total_ref = sum(st["n_ref"] for st in stats)
    total_matched = sum(st["matched"] for st in stats)
    assert total_ref > 0, "reference produced no detections — undertrained?"
    assert total_matched >= 0.9 * total_ref, \
        f"matched {total_matched}/{total_ref}"
    assert max(st["score_diff"] for st in stats) < 5e-3
    assert max(st["mask_diff"] for st in stats) < 0.02
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--params", default=None,
                    help="skip training, reuse saved params")
    ap.add_argument("--out", default="/tmp/ref_e2e_params.pkl")
    ap.add_argument("--scenes", type=int, default=4)
    args = ap.parse_args()

    path = args.params or train(args.steps, args.lr, args.batch,
                                args.seed, args.out)
    stats = compare(path, n_scenes=args.scenes)
    total_ref = sum(st["n_ref"] for st in stats)
    total_matched = sum(st["matched"] for st in stats)
    print(f"PASS: {total_matched}/{total_ref} detections matched "
          f"across {len(stats)} scenes")


if __name__ == "__main__":
    main()
