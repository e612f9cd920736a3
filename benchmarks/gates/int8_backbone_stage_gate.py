"""Gate: per-stage decomposition of the int8 backbone (2.93 ms/img at
b32 — 52% of the int8 pipeline). Cumulative prefixes of
quant.fpn_forward: stem -> +C2 -> +C3 -> +C4 -> +C5 -> +neck.

    PYTHONPATH=/root/.axon_site:. python benchmarks/gates/int8_backbone_stage_gate.py [batch]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from maskrcnn_tpu import quant  # noqa: E402
from maskrcnn_tpu.config import CocoInferenceConfig  # noqa: E402
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN  # noqa: E402
from maskrcnn_tpu.ops.image import normalize_image  # noqa: E402

ITERS = 8


def main(batch=32):
    cfg = CocoInferenceConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    h, w = cfg.IMAGE_SHAPE[:2]
    calib = quant.default_calib_canvases((h, w), n=2)
    qp = quant.prepare_quant_params(model, params, calib, batch_size=2)
    qp = jax.device_put(qp)
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 200, (batch, h, w, 3)).astype(np.uint8))
    blocks4 = {"resnet50": 6, "resnet101": 23}[cfg.BACKBONE]

    def prefix(upto):
        def run(imgs):
            ctx = quant._Ctx(mode="int8",
                             dtype=jnp.dtype(cfg.COMPUTE_DTYPE),
                             tree=qp["quant"])
            x = normalize_image(imgs, cfg.MEAN_PIXEL)
            x = jax.nn.relu(ctx.float_conv(
                quant._stem_entry(ctx), x, strides=(2, 2),
                padding=((3, 3), (3, 3))))
            c1 = nn.max_pool(x, (3, 3), strides=(2, 2),
                             padding=((0, 1), (0, 1)))
            if upto == "stem":
                return c1.astype(jnp.float32).sum()
            c2 = quant._stage(ctx, "resnet/C2", c1, 3, 1)
            if upto == "C2":
                return c2.astype(jnp.float32).sum()
            c3 = quant._stage(ctx, "resnet/C3", c2, 4, 2)
            if upto == "C3":
                return c3.astype(jnp.float32).sum()
            c4 = quant._stage(ctx, "resnet/C4", c3, blocks4, 2)
            if upto == "C4":
                return c4.astype(jnp.float32).sum()
            c5 = quant._stage(ctx, "resnet/C5", c4, 3, 2)
            if upto == "C5":
                return c5.astype(jnp.float32).sum()
            feats = None
            ctx2 = quant._Ctx(mode="int8",
                              dtype=jnp.dtype(cfg.COMPUTE_DTYPE),
                              tree=qp["quant"])
            feats = quant.fpn_forward(cfg, ctx2, normalize_image(
                imgs, cfg.MEAN_PIXEL))
            return sum(f.astype(jnp.float32).sum() for f in feats)

        @jax.jit
        def loop(imgs):
            def body(i, acc):
                return acc + run(imgs + i.astype(jnp.uint8))

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        return loop

    prev = 0.0
    for s in ("stem", "C2", "C3", "C4", "C5", "full"):
        loop = prefix(s)
        float(loop(images))
        t0 = time.perf_counter()
        float(loop(images))
        dt = time.perf_counter() - t0
        ms = 1e3 * dt / (batch * ITERS)
        print(f"{s:5s} cumulative {ms:6.2f} ms/img   stage "
              f"{ms - prev:6.2f}", file=sys.stderr, flush=True)
        prev = ms


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
