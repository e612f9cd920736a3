"""Gate: where do the C1 stem's 0.55 ms/img go?

The stem is: uint8 -> normalize (f32 sub-mean, cast bf16) -> 7x7/2
conv (3->64ch) -> ReLU -> 3x3/2 maxpool. At 4% of its FLOP roofline
(3 of 128 MXU lanes) and ~15% of a naive bandwidth bound, it is the
largest non-quantizable piece of the int8 backbone. This times each
sub-stage cumulatively to find the binding constraint, plus two
variants: (a) conv fed uint8-centered int8 pixels (int8 x int8 MXU),
(b) conv at f32 (no bf16 cast).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
H = W = 1024
ITERS = 50
dn = ("NHWC", "HWIO", "NHWC")
MEAN = np.array([123.7, 116.8, 103.9], np.float32)


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
    return dt / ITERS / B * 1e3   # ms/img


def main():
    k = jax.random.PRNGKey(0)
    imgs = jax.random.randint(k, (B, H, W, 3), 0, 255, jnp.uint8)
    kern = jax.random.normal(k, (7, 7, 3, 64), jnp.bfloat16) * 0.05
    kern8 = jnp.clip(jnp.round(
        jax.random.normal(k, (7, 7, 3, 64)) * 63), -127, 127
    ).astype(jnp.int8)
    mean = jnp.asarray(MEAN)

    def norm_only(i, imgs, kern):
        x = (imgs + i.astype(jnp.uint8)).astype(jnp.float32) - mean
        return x.astype(jnp.bfloat16).astype(jnp.float32).sum()

    def conv_stage(i, imgs, kern):
        x = ((imgs + i.astype(jnp.uint8)).astype(jnp.float32)
             - mean).astype(jnp.bfloat16)
        y = jax.nn.relu(lax.conv_general_dilated(
            x, kern, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn))
        return y.astype(jnp.float32).sum()

    def full_stem(i, imgs, kern):
        x = ((imgs + i.astype(jnp.uint8)).astype(jnp.float32)
             - mean).astype(jnp.bfloat16)
        y = jax.nn.relu(lax.conv_general_dilated(
            x, kern, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn))
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((0, 1), (0, 1)))
        return y.astype(jnp.float32).sum()

    def int8_stem(i, imgs, kern):
        # pixels centered at 128 fit int8 exactly; per-channel mean
        # correction folds into the bias (constant: conv(ones*delta))
        x = ((imgs + i.astype(jnp.uint8)).astype(jnp.int32) - 128) \
            .astype(jnp.int8)
        y32 = lax.conv_general_dilated(
            x, kern8, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = jax.nn.relu(y32.astype(jnp.float32) * 0.01) \
            .astype(jnp.bfloat16)
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((0, 1), (0, 1)))
        return y.astype(jnp.float32).sum()

    print(f"normalize only:    {_time(norm_only, imgs, kern):.3f} ms/img",
          file=sys.stderr)
    print(f"+ 7x7/2 conv+relu: {_time(conv_stage, imgs, kern):.3f} ms/img",
          file=sys.stderr)
    print(f"+ 3x3/2 maxpool:   {_time(full_stem, imgs, kern):.3f} ms/img",
          file=sys.stderr)
    print(f"int8 pixel stem:   {_time(int8_stem, imgs, kern):.3f} ms/img",
          file=sys.stderr)


if __name__ == "__main__":
    main()
