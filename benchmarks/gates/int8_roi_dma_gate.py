"""Gate: int8 feature table for the PALLAS RoIAlign (DMA-bound, unlike
the rejected XLA int8 gather).

The Pallas kernel moves a 32x40xC patch per box (~654 KB at bf16
C=256); at its measured ~0.78 ms/img for 500 boxes that is ~420 GB/s —
DMA-bandwidth-bound, so halving the bytes with an int8 table should
nearly halve the time (the in-VMEM blends already cast to f32; the
skeleton gate measured the cast itself neutral). This times the
production kernel with bf16 vs int8 tables. Output quality is not
asserted here (the real int8 pipeline would apply per-level scales
in-kernel); this is purely the byte-rate question.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from maskrcnn_tpu.ops.roi_align_pallas import (  # noqa: E402
    batched_multilevel_roi_align_pallas)

C = 256
SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32)]
IMAGE_SHAPE = (1024, 1024, 3)
ITERS = 16


def run(dtype, b, n=500, pool=7):
    ks = jax.random.split(jax.random.PRNGKey(0), len(SHAPES))
    if dtype == jnp.int8:
        feats = [jax.random.randint(k, (b, h, w, C), -127, 128, jnp.int8)
                 for k, (h, w) in zip(ks, SHAPES)]
    else:
        feats = [jax.random.normal(k, (b, h, w, C), dtype)
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
            out = batched_multilevel_roi_align_pallas(
                feats, bx, pool, IMAGE_SHAPE)
            return acc + out.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(feats, boxes))
    t0 = time.perf_counter()
    v = float(loop(feats, boxes))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    per_img = dt / (ITERS * b)
    print(f"{np.dtype(dtype).name:8s} b={b}: {per_img * 1e3:.3f} ms/img",
          file=sys.stderr)
    return per_img


if __name__ == "__main__":
    for b in (8, 32):
        a = run(jnp.bfloat16, b)
        c = run(jnp.int8, b)
        print(f"  int8/bf16 at b={b}: {c / a:.3f}", file=sys.stderr)
