"""Gate: honest standalone cost of the production RoIAlign paths.

Times detection.pipeline._pool_rois (the exact production call) for the
XLA patch-gather and the Pallas DMA kernel, batch 1 and 8, with the box
tensor rotated every iteration inside the jitted fori_loop so nothing
hoists or CSEs. Levels are realistic FPN shapes at 1024px with a
box-size distribution that routes most boxes to P2 (like real
proposals).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from maskrcnn_tpu.detection.pipeline import _pool_rois  # noqa: E402

C = 256
SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32), (16, 16)]
IMAGE_SHAPE = (1024, 1024, 3)
ITERS = 24


def run(impl, b, n, pool):
    ks = jax.random.split(jax.random.PRNGKey(0), len(SHAPES))
    feats = [jax.random.normal(k, (b, h, w, C), jnp.bfloat16)
             for k, (h, w) in zip(ks, SHAPES)]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.uniform(k1, (b, n, 4))
    size = 0.03 + jax.random.uniform(k2, (b, n, 1)) ** 2 * 0.4
    y1 = u[..., 0:1] * (1 - size)
    x1 = u[..., 1:2] * (1 - size)
    boxes = jnp.concatenate([y1, x1, y1 + size, x1 + size], -1)

    @jax.jit
    def loop(feats, boxes):
        def body(i, acc):
            bx = jnp.roll(boxes, i, axis=1)
            out = _pool_rois(feats, bx, pool, IMAGE_SHAPE, impl=impl)
            return acc + out.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(feats, boxes))
    t0 = time.perf_counter()
    v = float(loop(feats, boxes))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    per_img = dt / (ITERS * b)
    print(f"{impl:6s} b={b} n={n} pool={pool}: {per_img * 1e3:.3f} ms/img",
          file=sys.stderr)
    return per_img


if __name__ == "__main__":
    for impl in ("xla", "pallas"):
        for b in (1, 8):
            run(impl, b, 500, 7)
    run("xla", 1, 50, 14)
    run("pallas", 1, 50, 14)
