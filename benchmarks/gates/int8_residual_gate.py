"""Gate: int8 residual stream between bottlenecks.

The production int8 backbone (quant.py) quantizes each block's INPUT
for conv1/downsample but carries the residual stream in bf16 — so one
bf16 tensor (32 MB at the C2 shape) crosses HBM per block boundary.
If the residual add instead consumes the dequantized int8 input (the
same values conv1 already sees) and the block emits ONLY the int8
output, the boundary traffic halves. C2/C3 are bandwidth-bound, so
this should show there; C4 is MXU-bound and should be neutral.

Measures 3-block chains at the C2 and C4 shapes:
  a) current: int8 convs, bf16 residual stream
  b) res-int8: int8-only stream, residual = dequant(input int8)
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
ITERS = 100
dn = ("NHWC", "HWIO", "NHWC")


def conv(x, k, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=dn,
        preferred_element_type=jnp.int32)


def q8(x, inv_s):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_s),
                    -127, 127).astype(jnp.int8)


def block_bf16res(x_bf, ks):
    """Current scheme: block input arrives bf16, is quantized for the
    convs, residual adds the bf16."""
    k1, k2, k3 = ks
    xq = q8(x_bf, 4.0)
    o = q8(jax.nn.relu(conv(xq, k1, [(0, 0)] * 2).astype(jnp.float32)
                       * 0.01), 8.0)
    o = q8(jax.nn.relu(conv(o, k2, [(1, 1)] * 2).astype(jnp.float32)
                       * 0.001), 8.0)
    o = conv(o, k3, [(0, 0)] * 2).astype(jnp.float32) * 0.001
    return jax.nn.relu(o.astype(jnp.bfloat16) + x_bf)


def block_i8res(x_i8, ks):
    """Residual-int8 scheme: block input arrives int8 (scale 1/4),
    residual dequantizes it; only int8 leaves the block."""
    k1, k2, k3 = ks
    o = q8(jax.nn.relu(conv(x_i8, k1, [(0, 0)] * 2).astype(jnp.float32)
                       * 0.01), 8.0)
    o = q8(jax.nn.relu(conv(o, k2, [(1, 1)] * 2).astype(jnp.float32)
                       * 0.001), 8.0)
    o = conv(o, k3, [(0, 0)] * 2).astype(jnp.float32) * 0.001
    y = jax.nn.relu(o + x_i8.astype(jnp.float32) * 0.25)
    return q8(y, 4.0)


def bench(name, fn, x, kss):
    @jax.jit
    def loop(x, kss):
        def body(i, acc):
            h = x
            for ks in kss:
                h = fn(h, ks)
            return acc + h.astype(jnp.float32).sum() + acc * 0

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(x, kss))
    t0 = time.perf_counter()
    v = float(loop(x, kss))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    per = dt / ITERS * 1e3
    print(f"{name}: {per:.3f} ms per 3-block chain (b={B})",
          file=sys.stderr)
    return per


def run_shape(tag, hw, cmid, cfull):
    k = jax.random.PRNGKey(0)
    kss = [(jax.random.randint(k, (1, 1, cfull, cmid), -127, 128,
                               jnp.int8),
            jax.random.randint(k, (3, 3, cmid, cmid), -127, 128,
                               jnp.int8),
            jax.random.randint(k, (1, 1, cmid, cfull), -127, 128,
                               jnp.int8)) for _ in range(3)]
    x_bf = jax.random.normal(k, (B, hw, hw, cfull), jnp.bfloat16)
    a = bench(f"{tag} bf16-residual", block_bf16res, x_bf, kss)
    x_i8 = jax.random.randint(k, (B, hw, hw, cfull), -127, 128,
                              jnp.int8)
    b = bench(f"{tag} int8-residual", block_i8res, x_i8, kss)
    print(f"  {tag}: int8res/bf16res = {b / a:.3f}", file=sys.stderr)


if __name__ == "__main__":
    run_shape("C2 (256^2, 64/256)", 256, 64, 256)
    run_shape("C4 (64^2, 256/1024)", 64, 256, 1024)
