"""Gate 2: full bottleneck CHAIN int8-with-requant vs bf16.

Measures what the isolated-conv gate couldn't: the dequant -> bias ->
relu -> requant elementwise epilogues between int8 convs, and whether
the int32 conv outputs materialize. Shapes: C2 identity block
(256x256, 64/256 ch, bandwidth-bound) and C4 identity block
(64x64, 256/1024 ch, MXU-bound), batch 8.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
ITERS = 300
dn = ("NHWC", "HWIO", "NHWC")


def conv(x, k, pad, odt):
    return lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=dn,
        preferred_element_type=odt)


def bneck_bf16(x, ks):
    k1, k2, k3 = ks
    o = jax.nn.relu(conv(x, k1, [(0, 0)] * 2, jnp.bfloat16))
    o = jax.nn.relu(conv(o, k2, [(1, 1)] * 2, jnp.bfloat16))
    o = conv(o, k3, [(0, 0)] * 2, jnp.bfloat16)
    return jax.nn.relu(o + x)


def requant(y_i32, scale, relu=True):
    y = y_i32.astype(jnp.float32) * scale
    if relu:
        y = jax.nn.relu(y)
    q = jnp.clip(jnp.round(y * 4.0), -127, 127).astype(jnp.int8)
    return q


def bneck_i8(x_i8, x_bf, ks):
    """int8 chain; residual carried in bf16 alongside."""
    k1, k2, k3 = ks
    o = requant(conv(x_i8, k1, [(0, 0)] * 2, jnp.int32), 0.01)
    o = requant(conv(o, k2, [(1, 1)] * 2, jnp.int32), 0.001)
    o = conv(o, k3, [(0, 0)] * 2, jnp.int32).astype(jnp.float32) * 0.001
    y = jax.nn.relu(o.astype(jnp.bfloat16) + x_bf)
    # quantize for the next block's conv1
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * 4.0),
                 -127, 127).astype(jnp.int8)
    return q, y


def bench(name, fn, args):
    f = jax.jit(fn)
    float(f(*args))  # compile + warm
    t0 = time.perf_counter()
    float(f(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3/ITERS:.3f} ms/iter ({dt*1e3/ITERS/B:.4f} ms/img)")


def run(tag, H, W, P):
    rng = np.random.RandomState(0)
    C = P * 4
    x_bf = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
    ks_bf = [jnp.asarray(rng.randn(1, 1, C, P) * .05, jnp.bfloat16),
             jnp.asarray(rng.randn(3, 3, P, P) * .05, jnp.bfloat16),
             jnp.asarray(rng.randn(1, 1, P, C) * .05, jnp.bfloat16)]
    ks_i8 = [jnp.asarray(rng.randint(-127, 127, (1, 1, C, P)), jnp.int8),
             jnp.asarray(rng.randint(-127, 127, (3, 3, P, P)), jnp.int8),
             jnp.asarray(rng.randint(-127, 127, (1, 1, P, C)), jnp.int8)]

    def loop_bf(x, ks):
        def body(i, x):
            return bneck_bf16(x, ks)
        return lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()

    def loop_i8(x_i8, x_bf, ks):
        def body(i, c):
            return bneck_i8(c[0], c[1], ks)
        out = lax.fori_loop(0, ITERS, body, (x_i8, x_bf))
        return out[1].astype(jnp.float32).sum()

    bench(f"{tag} bf16 chain", loop_bf, (x_bf, ks_bf))
    bench(f"{tag} int8 chain", loop_i8, (x_i8, x_bf, ks_i8))


run("C2 (256x256, 64/256)", 256, 256, 64)
run("C4 (64x64, 256/1024)", 64, 64, 256)
