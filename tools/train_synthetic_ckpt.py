#!/usr/bin/env python
"""Train the flagship 1024px model on multi-class synthetic scenes and
save the checkpoint (VERDICT r3 item 6).

The executed notebook and the output/ golden renders previously used
RANDOM weights (no COCO assets in this environment). This produces a
real trained checkpoint at models/synthetic_trained/ plus a matching
demo scene at images/synthetic_scene.png, which build_notebook.py and
the render tools pick up automatically — so explore.ipynb's proposal /
detection cells show meaningful structure.

    python tools/train_synthetic_ckpt.py [--steps 240] [--batch 8]

~6 min on the TPU harness with a warm compile cache.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="models/synthetic_trained")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from protocol_ap_ab import train
    from synthetic_scenes import multiclass_scene, multiclass_train_batch

    from maskrcnn_tpu.checkpoint.store import (save_checkpoint,
                                               wait_for_saves)
    from maskrcnn_tpu.config import CocoInferenceConfig

    cfg = CocoInferenceConfig(DETECTION_MIN_CONFIDENCE=0.0,
                              MAX_GT_INSTANCES=8)
    rng = np.random.RandomState(3)
    pool = []
    for _ in range(10):
        b = multiclass_train_batch(rng, cfg, args.batch)
        masks = b.pop("gt_masks")
        b["gt_masks_packed"] = np.packbits(masks, axis=-1)
        pool.append(jax.device_put(b))

    params = train(cfg, args, pool, "synthetic")
    save_checkpoint(args.out, params, epoch=args.steps)
    wait_for_saves()
    print(f"checkpoint saved: {args.out} (epoch tag {args.steps})")

    from PIL import Image
    d = cfg.IMAGE_MAX_DIM
    img, _ = multiclass_scene(np.random.RandomState(501), d)
    os.makedirs("images", exist_ok=True)
    Image.fromarray(img).save("images/synthetic_scene.png")
    print("demo scene saved: images/synthetic_scene.png")


if __name__ == "__main__":
    main()
