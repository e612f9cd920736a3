"""Gate: does int8 conv hit the 2x MXU rate on v5e via XLA?

Shapes: C4 bottleneck 3x3 conv (64x64x256 -> 256, stride 1) and the
1x1 1024->256 / 256->1024 pair, batch 8.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W = 8, 64, 64
ITERS = 300

def conv(x, k, dtype_out):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype_out)

def bench(name, cin, cout, kk, xdt, kdt, odt):
    rng = np.random.RandomState(0)
    if xdt == jnp.int8:
        x = jnp.asarray(rng.randint(-127, 127, (B, H, W, cin)), jnp.int8)
        k = jnp.asarray(rng.randint(-127, 127, (kk, kk, cin, cout)), jnp.int8)
    else:
        x = jnp.asarray(rng.randn(B, H, W, cin), xdt)
        k = jnp.asarray(rng.randn(kk, kk, cin, cout) * 0.05, kdt)

    @jax.jit
    def loop(x, k):
        def body(i, acc):
            xi = x + acc.astype(x.dtype)[..., :1] * 0
            o = conv(xi, k, odt)
            return o[..., :cin] if cout >= cin else jnp.pad(
                o, [(0, 0)] * 3 + [(0, cin - cout)]).astype(odt)
        # simpler: independent convs accumulated via checksum
        def body2(i, acc):
            o = conv(x + i.astype(x.dtype), k, odt)
            return acc + o.sum(dtype=jnp.float32)
        return lax.fori_loop(0, ITERS, body2, jnp.float32(0))

    float(loop(x, k))  # compile+warm
    t0 = time.perf_counter()
    float(loop(x, k))
    dt = time.perf_counter() - t0
    flops = 2 * B * H * W * cin * cout * kk * kk * ITERS
    print(f"{name}: {dt*1e3/ITERS:.3f} ms/iter  {flops/dt/1e12:.1f} TOP/s")

bench("3x3 256->256 bf16", 256, 256, 3, jnp.bfloat16, jnp.bfloat16, jnp.bfloat16)
bench("3x3 256->256 int8->int32", 256, 256, 3, jnp.int8, jnp.int8, jnp.int32)
bench("1x1 1024->256 bf16", 1024, 256, 1, jnp.bfloat16, jnp.bfloat16, jnp.bfloat16)
bench("1x1 1024->256 int8->int32", 1024, 256, 1, jnp.int8, jnp.int8, jnp.int32)
bench("1x1 256->1024 bf16", 256, 1024, 1, jnp.bfloat16, jnp.bfloat16, jnp.bfloat16)
bench("1x1 256->1024 int8->int32", 256, 1024, 1, jnp.int8, jnp.int8, jnp.int32)
