"""Gate: C1 stem 7x7/2 conv as im2col + matmul.

The direct conv uses 3 of 128 MXU input lanes (stem_gate.py: ~1.0
ms/img standalone at the lane-bound rate). An explicit im2col turns it
into [512^2, 147] x [147, 64] — K=147 fills the lanes; the cost moves
to materializing the 77 MB patch tensor (bandwidth, ~0.2 ms). Round 2
measured the s2d reformulation (K=192, 4x4 on 2x2-blocked 12ch)
neutral in-pipeline; im2col is the more aggressive version of the same
trade. Also times an s2d arm for reference.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
H = W = 1024
ITERS = 50
dn = ("NHWC", "HWIO", "NHWC")


def _time(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    v = float(loop(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return dt / ITERS / B * 1e3


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, 3), jnp.bfloat16)
    kern = jax.random.normal(k, (7, 7, 3, 64), jnp.bfloat16) * 0.05

    def direct(i, x, kern):
        xi = x + jnp.bfloat16(0) * i
        y = lax.conv_general_dilated(
            xi, kern, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        return jax.nn.relu(y).astype(jnp.float32).sum()

    def im2col(i, x, kern):
        xi = x + jnp.bfloat16(0) * i
        xp = jnp.pad(xi, ((0, 0), (3, 3), (3, 3), (0, 0)))
        # 49 strided slices -> [B, 512, 512, 7*7*3]
        cols = [xp[:, dy:dy + H:2, dx:dx + W:2, :]
                for dy in range(7) for dx in range(7)]
        patches = jnp.concatenate(cols, axis=-1)
        y = patches.reshape(B, H // 2, W // 2, 147) @ \
            kern.transpose(0, 1, 2, 3).reshape(147, 64)
        return jax.nn.relu(y).astype(jnp.float32).sum()

    def s2d(i, x, kern):
        xi = x + jnp.bfloat16(0) * i
        xp = jnp.pad(xi, ((0, 0), (3, 5), (3, 5), (0, 0)))
        # 2x2 space-to-depth: [B, 1032, 1032, 3] -> [B, 516, 516, 12]
        hb, wb = xp.shape[1] // 2, xp.shape[2] // 2
        xb = xp.reshape(B, hb, 2, wb, 2, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, hb, wb, 12)
        # equivalent 4x4/1 kernel on the blocked input
        kp = jnp.pad(kern, ((0, 1), (0, 1), (0, 0), (0, 0)))
        kb = kp.reshape(4, 2, 4, 2, 3, 64).transpose(
            0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)
        y = lax.conv_general_dilated(
            xb, kb, (1, 1), "VALID", dimension_numbers=dn)
        return jax.nn.relu(y).astype(jnp.float32).sum()

    a = _time(direct, x, kern)
    print(f"direct 7x7/2 conv: {a:.3f} ms/img", file=sys.stderr)
    b = _time(im2col, x, kern)
    print(f"im2col + matmul:   {b:.3f} ms/img ({b / a:.3f}x)",
          file=sys.stderr)
    c = _time(s2d, x, kern)
    print(f"s2d 4x4 conv:      {c:.3f} ms/img ({c / a:.3f}x)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
