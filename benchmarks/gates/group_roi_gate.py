"""Gate: grouped (K=4) RoIAlign compute skeleton cost per box.

The v1 kernel costs ~3us/box dominated by per-box Mosaic ops (7 dynamic
-slice blends + 1 dot). The grouped design amortizes ops across K boxes:
  dot1: Wy_blockdiag [K*7, K*32] x patches2d [K*32, 40*C] -> T [K*7, 40*C]
  reshape: T -> [K*7, 40, C]          (the suspect relayout)
  dot2: Wx [K*7, 40] x T3 [K*7, 40, C] -> [K*7(q), K*7(p), C]
  extract K diagonal 7x7 blocks.
This kernel runs the skeleton on VMEM-resident dummy data (no DMA, no
coordinate math) for 500 boxes; if the measured per-box cost is well
under ~2us, the full kernel is worth building. Also measures the
bf16-patch variant (cast-to-f32 included, as the real kernel would pay).
"""
import functools
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K, POOL, PATCH, PX, C = 4, 7, 32, 40, 256
GROUPS = 125   # 500 boxes
ITERS = 20


def kernel3d(patches_ref, out_ref, wy_scratch, *, cast_from_bf16: bool):
    """Variant c: patches resident as [K*PATCH, PX, C] 3D; dot1
    contracts the MAJOR dim (no reshape/relayout anywhere)."""
    kq = K * POOL
    kr = K * PATCH

    def group(i, acc):
        yiota = jax.lax.broadcasted_iota(jnp.int32, (kq, kr), 1)
        rowidx = jax.lax.broadcasted_iota(jnp.int32, (kq, kr), 0)
        base = (rowidx // POOL) * PATCH + (rowidx % POOL) * 2 + i % 3
        wy = ((yiota == base).astype(jnp.float32) * 0.25
              + (yiota == base + 1).astype(jnp.float32) * 0.75)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (kq, PX), 1)
        qidx = jax.lax.broadcasted_iota(jnp.int32, (kq, PX), 0)
        xb = (qidx % POOL) * 2 + i % 5
        wx = ((xiota == xb).astype(jnp.float32) * 0.5
              + (xiota == xb + 1).astype(jnp.float32) * 0.5)

        p3d = patches_ref[...]
        if cast_from_bf16:
            p3d = p3d.astype(jnp.float32)
        t3 = jax.lax.dot_general(
            wy, p3d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [kq, PX, C]
        cell = jax.lax.dot_general(
            wx, t3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [kq, kq(p), C]
        for k in range(K):
            out_ref[k, :, :, :] = cell[
                k * POOL:(k + 1) * POOL,
                k * POOL:(k + 1) * POOL].astype(out_ref.dtype)
        return acc

    jax.lax.fori_loop(0, GROUPS * ITERS, group, 0)


def kernel(patches_ref, out_ref, wy_scratch, *, cast_from_bf16: bool):
    # one-hot-ish weights built once here (in the real kernel they vary
    # per group; building them is ~6 vector ops — included below inside
    # the loop to be fair)
    kq = K * POOL
    kr = K * PATCH

    def group(i, acc):
        yiota = jax.lax.broadcasted_iota(jnp.int32, (kq, kr), 1)
        rowidx = jax.lax.broadcasted_iota(jnp.int32, (kq, kr), 0)
        base = (rowidx // POOL) * PATCH + (rowidx % POOL) * 2 + i % 3
        wy = ((yiota == base).astype(jnp.float32) * 0.25
              + (yiota == base + 1).astype(jnp.float32) * 0.75)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (kq, PX), 1)
        qidx = jax.lax.broadcasted_iota(jnp.int32, (kq, PX), 0)
        xb = (qidx % POOL) * 2 + i % 5
        wx = ((xiota == xb).astype(jnp.float32) * 0.5
              + (xiota == xb + 1).astype(jnp.float32) * 0.5)

        p2d = patches_ref[...]
        if cast_from_bf16:
            p2d = p2d.astype(jnp.float32)
        t = jax.lax.dot_general(
            wy, p2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [kq, PX*C]
        t3 = t.reshape(kq, PX, C)
        cell = jax.lax.dot_general(
            wx, t3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [kq, kq(p), C]
        for k in range(K):
            out_ref[k, :, :, :] = cell[
                k * POOL:(k + 1) * POOL,
                k * POOL:(k + 1) * POOL].astype(out_ref.dtype)
        return acc

    jax.lax.fori_loop(0, GROUPS * ITERS, group, 0)


def run(name, kern, shape, dtype, cast):
    rng = np.random.RandomState(0)
    patches = jnp.asarray(rng.randn(*shape), dtype)
    f = pl.pallas_call(
        functools.partial(kern, cast_from_bf16=cast),
        in_specs=[pl.BlockSpec(shape, lambda: (0,) * len(shape))],
        out_specs=pl.BlockSpec((K, POOL, POOL, C), lambda: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, POOL, POOL, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    g = jax.jit(lambda p: f(p).sum())
    try:
        float(g(patches))
        t0 = time.perf_counter()
        float(g(patches))
        dt = time.perf_counter() - t0
        per_box = dt / (GROUPS * ITERS * K) * 1e6
        print(f"{name} {dtype.__name__} cast={cast}: {per_box:.2f} us/box "
              f"({dt*1e3/ITERS:.3f} ms per 500 boxes)", flush=True)
    except Exception as e:
        print(f"{name} {dtype.__name__} cast={cast} FAILED: "
              f"{type(e).__name__} {str(e)[:200]}", flush=True)


run("2d+reshape", kernel, (K * PATCH, PX * C), jnp.float32, False)
run("2d+reshape", kernel, (K * PATCH, PX * C), jnp.bfloat16, True)
run("3d-majordot", kernel3d, (K * PATCH, PX, C), jnp.float32, False)
run("3d-majordot", kernel3d, (K * PATCH, PX, C), jnp.bfloat16, True)
