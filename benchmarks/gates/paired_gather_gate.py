"""Gate: f32-paired RoIAlign gather with the pairing fused into table
construction.

Round-2 measured a float32-bitcast gather (bf16 channel pairs viewed as
f32 -> half the gather elements for the same bytes) ~20% faster
standalone but a net LOSS in the pipeline because the bitcast of the
already-concatenated table materialized a full table copy. This gate
asks: if each LEVEL is bitcast before the pad/concat — so the stacked
table is built directly in paired-f32 layout and no extra copy exists —
does the standalone win survive end-to-end table-build + gather + blend?

Measures three variants of the full 500-box 7x7 multilevel crop
(table build from raw per-level maps included in the timed region,
as in the real pipeline where the table is consumed fused):
  a) bf16 table, bf16 (2,2,256) gather          [current production]
  b) bf16 levels -> pad/concat -> bitcast table [round-2 reject]
  c) bf16 levels -> bitcast each -> pad/concat  [new: pairing fused]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, POOL, C = 500, 7, 256
SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32)]  # P2..P5 @1024
ITERS = 24


def make_levels(key):
    ks = jax.random.split(key, len(SHAPES))
    return [jax.random.normal(k, (h, w, C), jnp.bfloat16)
            for k, (h, w) in zip(ks, SHAPES)]


def sample_coords(key, n):
    """Per-box (level, y0, x0, ty, tx) for a POOLxPOOL grid; precomputed
    outside the timed region (identical for all variants) so the gate
    isolates table-build + gather + blend."""
    k1, k2 = jax.random.split(key)
    lvl = jax.random.randint(k1, (n,), 0, 4)
    hs = jnp.asarray([h for h, _ in SHAPES], jnp.float32)[lvl]
    ws = jnp.asarray([w for _, w in SHAPES], jnp.float32)[lvl]
    off = jnp.asarray(
        np.concatenate([[0], np.cumsum([h for h, _ in SHAPES])])[:-1],
        jnp.float32)[lvl]
    u = jax.random.uniform(k2, (n, 4))
    y1 = u[:, 0] * 0.7
    x1 = u[:, 1] * 0.7
    y2 = y1 + 0.05 + u[:, 2] * 0.25
    x2 = x1 + 0.05 + u[:, 3] * 0.25
    p = jnp.arange(POOL, dtype=jnp.float32) / (POOL - 1)
    in_y = (y1[:, None] + p[None] * (y2 - y1)[:, None]) * (hs[:, None] - 1)
    in_x = (x1[:, None] + p[None] * (x2 - x1)[:, None]) * (ws[:, None] - 1)
    ys = jnp.clip(jnp.floor(in_y), 0, hs[:, None] - 2)
    xs = jnp.clip(jnp.floor(in_x), 0, ws[:, None] - 2)
    ty = in_y - ys
    tx = in_x - xs
    sy = jnp.broadcast_to((ys + off[:, None])[:, :, None], (n, POOL, POOL))
    sx = jnp.broadcast_to(xs[:, None, :], (n, POOL, POOL))
    starts = jnp.stack([sy.reshape(-1), sx.reshape(-1)], 1).astype(jnp.int32)
    return starts, ty.astype(jnp.float32), tx.astype(jnp.float32)


def build_table(levels, pair: bool):
    wmax = max(w for _, w in SHAPES)
    padded = []
    for f in levels:
        if pair:
            h, w, c = f.shape
            f = jax.lax.bitcast_convert_type(
                f.reshape(h, w, c // 2, 2), jnp.float32)
        padded.append(jnp.pad(
            f, ((0, 0), (0, wmax - f.shape[1]), (0, 0))))
    return jnp.concatenate(padded, axis=0)


def gather_blend(table, starts, ty, tx, paired: bool):
    ht, wt, c = table.shape
    idx = jnp.concatenate(
        [starts, jnp.zeros((starts.shape[0], 1), starts.dtype)], 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    g = jax.lax.gather(table, idx, dn, slice_sizes=(2, 2, c),
                       mode=jax.lax.GatherScatterMode.CLIP)
    if paired:
        g = jax.lax.bitcast_convert_type(g, jnp.bfloat16)
        g = g.reshape(g.shape[0], 2, 2, 2 * c)
    n = starts.shape[0] // (POOL * POOL)
    patches = g.reshape(n, POOL, POOL, 2, 2, -1).astype(jnp.float32)
    wy = jnp.stack([1.0 - ty, ty], -1)
    wx = jnp.stack([1.0 - tx, tx], -1)
    w = wy[:, :, None, :, None] * wx[:, None, :, None, :]
    return (patches * w[..., None]).sum(axis=(3, 4))


def _time_loop(fn, *args):
    """Time ITERS iterations of fn inside one jitted fori_loop; the
    iteration index perturbs the (cheap) index/weight inputs so nothing
    hoists while the table stays a loop constant — mirroring production,
    where the table is one materialized array consumed by many gathers."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a).sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    v = float(loop(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return dt / ITERS


def run(name, pair, include_build: bool):
    levels = make_levels(jax.random.PRNGKey(0))
    starts, ty, tx = sample_coords(jax.random.PRNGKey(1), N)

    if include_build:
        def step(i, levels, starts, ty, tx):
            lv = [f + jnp.bfloat16(0) * i for f in levels]
            table = build_table(lv, pair)
            s = jnp.minimum(starts + i * 0, starts)
            return gather_blend(table, s, ty, tx, pair)

        per = _time_loop(step, levels, starts, ty, tx)
    else:
        table = jax.jit(lambda lv: build_table(lv, pair))(levels)
        table = jax.block_until_ready(table)

        def step(i, table, starts, ty, tx):
            # rotate the box order per iteration: cheap, defeats CSE,
            # keeps the index distribution identical
            s = jnp.roll(starts, i, axis=0)
            t_ = jnp.roll(ty, i, axis=0)
            x_ = jnp.roll(tx, i, axis=0)
            return gather_blend(table, s, t_, x_, pair)

        per = _time_loop(step, table, starts, ty, tx)
    print(f"{name}: {per * 1e3:.3f} ms/img "
          f"({N} boxes {POOL}x{POOL}x{C})", file=sys.stderr)
    return per


if __name__ == "__main__":
    a = run("a) bf16 gather, table prebuilt", pair=False,
            include_build=False)
    c = run("c) paired-f32 gather, table prebuilt", pair=True,
            include_build=False)
    a2 = run("a+build) bf16, in-loop level->table build", pair=False,
             include_build=True)
    c2 = run("c+build) paired, in-loop level->table build", pair=True,
             include_build=True)
    print(f"gather-only ratio: {c / a:.3f}; with build: {c2 / a2:.3f}",
          file=sys.stderr)
