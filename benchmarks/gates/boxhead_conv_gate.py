"""Gate: BoxHead conv1 as 7x7 VALID conv vs reshape+matmul.

The box head's first layer is Conv(1024, (7,7), VALID) over [N,7,7,256]
pooled windows — mathematically one dense [N, 12544] x [12544, 1024].
int8_heads_gate measured the matmul form at 0.167 ms/img, but the
in-pipeline box stage carries ~0.5 ms beyond RoIAlign. This gate asks
whether XLA's conv lowering of the k=window VALID conv is the gap.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 32
N = B * 500
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


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (N, 7, 7, 256), jnp.bfloat16)
    w = jax.random.normal(k, (7, 7, 256, 1024), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(k, (1, 1, 1024, 1024), jnp.bfloat16) * 0.02
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_form(i, x, w, w2):
        h = x + jnp.bfloat16(0) * i
        h = jax.nn.relu(jax.lax.conv_general_dilated(
            h, w, (1, 1), "VALID", dimension_numbers=dn))
        h = jax.nn.relu(jax.lax.conv_general_dilated(
            h, w2, (1, 1), "VALID", dimension_numbers=dn))
        return h.astype(jnp.float32).sum()

    def matmul_form(i, x, w, w2):
        h = (x + jnp.bfloat16(0) * i).reshape(N, 7 * 7 * 256)
        h = jax.nn.relu(h @ w.reshape(7 * 7 * 256, 1024))
        h = jax.nn.relu(h @ w2.reshape(1024, 1024))
        return h.astype(jnp.float32).sum()

    a = _time(conv_form, x, w, w2)
    print(f"conv k=7 VALID form: {a * 1e3:.2f} ms/step "
          f"({a * 1e3 / B:.3f} ms/img)", file=sys.stderr)
    b = _time(matmul_form, x, w, w2)
    print(f"reshape+matmul form: {b * 1e3:.2f} ms/step "
          f"({b * 1e3 / B:.3f} ms/img)", file=sys.stderr)
    print(f"matmul/conv: {b / a:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
