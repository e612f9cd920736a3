"""Gate: do int8 RoI heads pay at production shapes?

The box head is two big matmuls per RoI batch (7x7x256 VALID conv ==
[N, 12544] x [12544, 1024], then 1024x1024); the mask head is 4x 3x3
256->256 convs on 14x14 windows. At b32 x 500 RoIs (box) / 32 x 50
(mask) these are ~480 + ~1500 GFLOP per step in bf16. This gate times
bf16 vs int8 (with quantize-on-entry + dequant epilogues, as quant.py
would run them) to see if the MXU saving survives the requant overhead
at these shapes.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 32
NBOX = B * 500      # box-head RoIs per step
NMASK = B * 50      # mask-head RoIs per step
ITERS = 8


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
    return dt / ITERS


def _q8(x, axis=None):
    amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6)
    s = amax / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def box_head_bf16():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (NBOX, 12544), jnp.bfloat16)
    w1 = jax.random.normal(k, (12544, 1024), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(k, (1024, 1024), jnp.bfloat16) * 0.02

    def step(i, x, w1, w2):
        xi = x + jnp.bfloat16(0) * i
        h = jax.nn.relu(xi @ w1)
        o = jax.nn.relu(h @ w2)
        return o.astype(jnp.float32).sum()

    per = _time(step, x, w1, w2)
    print(f"box head bf16: {per * 1e3:.2f} ms/step "
          f"({per * 1e3 / B:.3f} ms/img)", file=sys.stderr)
    return per


def box_head_int8():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (NBOX, 12544), jnp.bfloat16)
    w1, s1 = _q8(jax.random.normal(k, (12544, 1024), jnp.float32) * 0.02)
    w2, s2 = _q8(jax.random.normal(k, (1024, 1024), jnp.float32) * 0.02)

    def step(i, x, w1, w2):
        xi = (x + jnp.bfloat16(0) * i).astype(jnp.float32)
        xq = jnp.clip(jnp.round(xi * 127.0), -127, 127).astype(jnp.int8)
        h32 = jax.lax.dot(xq, w1, preferred_element_type=jnp.int32)
        h = jax.nn.relu(h32.astype(jnp.float32) * (s1 / 127.0))
        hq = jnp.clip(jnp.round(h * 12.7), -127, 127).astype(jnp.int8)
        o32 = jax.lax.dot(hq, w2, preferred_element_type=jnp.int32)
        o = jax.nn.relu(o32.astype(jnp.float32) * (s2 / 12.7))
        return o.sum()

    per = _time(step, x, w1, w2)
    print(f"box head int8: {per * 1e3:.2f} ms/step "
          f"({per * 1e3 / B:.3f} ms/img)", file=sys.stderr)
    return per


def mask_stack(int8: bool):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (NMASK, 14, 14, 256), jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")
    pad = ((1, 1), (1, 1))
    if int8:
        ws = [_q8(jax.random.normal(k, (3, 3, 256, 256), jnp.float32)
                  * 0.02) for _ in range(4)]

        def step(i, x, *wq):
            h = x + jnp.bfloat16(0) * i
            for w, s in zip(wq[0::2], wq[1::2]):
                hq = jnp.clip(jnp.round(h.astype(jnp.float32) * 127.0),
                              -127, 127).astype(jnp.int8)
                y32 = jax.lax.conv_general_dilated(
                    hq, w, (1, 1), pad, dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                h = jax.nn.relu(
                    y32.astype(jnp.float32) * (s / 127.0)).astype(
                        jnp.bfloat16)
            return h.astype(jnp.float32).sum()

        flat = [z for pair in ws for z in pair]
        per = _time(step, x, *flat)
    else:
        ws = [jax.random.normal(k, (3, 3, 256, 256), jnp.bfloat16) * 0.02
              for _ in range(4)]

        def step(i, x, *w):
            h = x + jnp.bfloat16(0) * i
            for wi in w:
                h = jax.nn.relu(jax.lax.conv_general_dilated(
                    h, wi, (1, 1), pad, dimension_numbers=dn))
            return h.astype(jnp.float32).sum()

        per = _time(step, x, *ws)
    name = "int8" if int8 else "bf16"
    print(f"mask stack {name}: {per * 1e3:.2f} ms/step "
          f"({per * 1e3 / B:.3f} ms/img)", file=sys.stderr)
    return per


if __name__ == "__main__":
    a = box_head_bf16()
    b = box_head_int8()
    c = mask_stack(False)
    d = mask_stack(True)
    print(f"box int8/bf16: {b / a:.3f}; mask int8/bf16: {d / c:.3f}",
          file=sys.stderr)
