#!/usr/bin/env python
"""Backbone-only throughput probe (the MFU worklist).

Times the ResNet-101+FPN forward in isolation inside one fori_loop (see
bench.py for the tunnel-measurement rationale), for a set of config
variants, printing ms/img and effective TFLOP/s. ResNet-101 @ 1024^2 is
~163 GFLOP/img forward; v5e peak is ~197 TFLOP/s bf16.

    python benchmarks/backbone_bench.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BACKBONE_GFLOP = 163 + 45  # ResNet-101 + FPN neck + P6, rough


def main(batch: int = 32, iters: int = 8):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maskrcnn_tpu.checkpoint.fold import fold_bn_params
    from maskrcnn_tpu.config import CocoInferenceConfig
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.ops.image import normalize_image

    variants = {
        "base": {},
        "fold": {"FOLD_BN": True},
        "s2d": {"S2D_STEM": True},
        "fold+s2d": {"FOLD_BN": True, "S2D_STEM": True},
    }
    rng = np.random.RandomState(0)
    d = 1024
    images = jax.device_put(
        rng.randint(0, 200, (batch, d, d, 3)).astype(np.uint8))

    for name, ov in variants.items():
        config = CocoInferenceConfig(**ov)
        model = MaskRCNN(config)
        params = model.init(jax.random.PRNGKey(0))
        if config.FOLD_BN:
            params = fold_bn_params(params)
        params = jax.device_put(params)

        @jax.jit
        def loop(params, images):
            def body(i, acc):
                x = normalize_image(images + i.astype(jnp.uint8),
                                    config.MEAN_PIXEL)
                feats = model.backbone(params, x)
                return acc + sum(f.sum(dtype=jnp.float32) for f in feats)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(loop(params, images))  # compile+warm
        t0 = time.perf_counter()
        v = float(loop(params, images))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        ms = 1e3 * dt / (batch * iters)
        tflops = BACKBONE_GFLOP / ms
        print(f"{name:10s} {ms:6.2f} ms/img  {tflops:6.1f} TFLOP/s eff")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    i = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(b, i)
