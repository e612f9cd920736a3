"""Gate: blocked (space-to-depth) activation layout for the TRAINING
bandwidth wall (ROADMAP item 5 / VERDICT r3 item 5).

Training at 1024px is bandwidth-walled at ~23.8 img/s/chip b16
(BENCHMARKS.md: flat per-image cost b8..b24 under REMAT_HEADS); the one
untried lever is an NCHW-like blocked activation layout. Two questions,
measured separately:

1. PADDING DIAGNOSTIC — do 64-channel tensors pay padded-lane HBM
   traffic? TPU vector tiles are (8 sublanes, 128 lanes) with the
   minor-most (channel) dim in lanes; if XLA stores C=64 padded to 128,
   every C2 bottleneck intermediate moves 2x its real bytes and a
   blocked layout halves true traffic. Timed: an elementwise
   read+write over [B,256,256,64] vs [B,128,128,256] (same elements,
   full lanes) vs [B,256,256,128] (2x elements). If 64ch times like
   128ch, padding waste is real.

2. CHAIN A/B — a C2 bottleneck chain (3 blocks: 1x1 256->64,
   3x3 64->64, 1x1 64->256, residual+relu) fwd+bwd in NHWC vs the
   dense space-to-depth equivalent on [B,H/2,W/2,4C]. The blocked 3x3
   carries [3,3,4P,4P] weights (the exact phase-structured kernel is
   block-sparse; XLA computes dense either way, so dense random
   weights time identically) — 4x the raw FLOPs, traded against
   full-lane utilization and zero padding waste. Also the C3 chain
   (P=128, already full-lane) as the control: blocked should only
   ever pay where lanes are underfilled.

Run directly on a TPU host: python benchmarks/gates/blocked_layout_gate.py
Verdict recorded in benchmarks/gates/README.md + BENCHMARKS.md.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
ITERS = 100
dn = ("NHWC", "HWIO", "NHWC")


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))  # compile + warm
    t0 = time.perf_counter()
    float(f(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt * 1e3 / ITERS:.3f} ms/iter "
          f"({dt * 1e3 / ITERS / B:.4f} ms/img)", flush=True)
    return dt / ITERS


# ---------------------------------------------------------------- 1 --
def elementwise_probe():
    rng = np.random.RandomState(0)

    def loop(x):
        def body(i, x):
            return x * 1.0001 + 0.001  # pure read+write, no reduction
        return lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()

    shapes = [("64ch   [16,256,256,64]", (B, 256, 256, 64)),
              ("256ch  [16,128,128,256]", (B, 128, 128, 256)),
              ("128ch  [16,256,256,128]", (B, 256, 256, 128))]
    out = {}
    for name, s in shapes:
        x = jnp.asarray(rng.randn(*s), jnp.bfloat16)
        out[name] = timeit(f"probe {name}", loop, x)
    return out


# ---------------------------------------------------------------- 2 --
def bneck(x, ks):
    k1, k2, k3 = ks
    o = jax.nn.relu(lax.conv_general_dilated(
        x, k1, (1, 1), [(0, 0)] * 2, dimension_numbers=dn))
    o = jax.nn.relu(lax.conv_general_dilated(
        o, k2, (1, 1), [(1, 1)] * 2, dimension_numbers=dn))
    o = lax.conv_general_dilated(
        o, k3, (1, 1), [(0, 0)] * 2, dimension_numbers=dn)
    return jax.nn.relu(o + x)


def chain_ab(tag, H, W, P, blocks=3):
    C = P * 4
    rng = np.random.RandomState(0)

    def make_ks(c_in, p, c_out):
        return [jnp.asarray(rng.randn(1, 1, c_in, p) * .05, jnp.bfloat16),
                jnp.asarray(rng.randn(3, 3, p, p) * .05, jnp.bfloat16),
                jnp.asarray(rng.randn(1, 1, p, c_out) * .05, jnp.bfloat16)]

    # NHWC baseline
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    ks = [make_ks(C, P, C) for _ in range(blocks)]

    def fwd(ks, x):
        for k in ks:
            x = bneck(x, k)
        return x.astype(jnp.float32).sum()

    def fwdbwd(ks, x):
        def body(i, acc):
            ks_p = jax.tree_util.tree_map(
                lambda t: t + (acc[1] * 0.0).astype(t.dtype),
                ks)  # defeat hoisting
            l, g = jax.value_and_grad(fwd)(ks_p, x)
            leaves = jax.tree_util.tree_leaves(g)
            gsum = sum(t.astype(jnp.float32).sum() for t in leaves)
            return (acc[0] + l, gsum * 1e-9)
        return lax.fori_loop(0, ITERS, body,
                             (jnp.float32(0), jnp.float32(0)))[0]

    t_nhwc = timeit(f"{tag} NHWC fwd+bwd", fwdbwd, ks, x)

    # blocked: s2d once outside the chain; every activation lives as
    # [B, H/2, W/2, 4C]; the 3x3's dense blocked kernel is [3,3,4P,4P]
    xb = jnp.asarray(rng.randn(B, H // 2, W // 2, 4 * C), jnp.bfloat16)
    ksb = [make_ks(4 * C, 4 * P, 4 * C) for _ in range(blocks)]
    t_blk = timeit(f"{tag} blocked(s2d) fwd+bwd", fwdbwd, ksb, xb)
    print(f"{tag}: blocked/NHWC = {t_blk / t_nhwc:.3f}x "
          f"({'blocked WINS' if t_blk < t_nhwc else 'NHWC wins'})",
          flush=True)


if __name__ == "__main__":
    print("== 1. lane-padding bandwidth diagnostic ==")
    elementwise_probe()
    print("== 2. C2/C3 bottleneck chain fwd+bwd A/B ==")
    chain_ab("C2 (256x256, P=64)", 256, 256, 64)
    chain_ab("C3 (128x128, P=128)", 128, 128, 128)
