"""Gate: int8 feature table + int32-bitcast gather vs bf16 gather.

Hypothesis: the (2,2,C) patch gather is VPU element-rate bound; int8
channels bitcast to int32 cut slice elements 4x vs bf16 (and bytes 4x),
so the RoIAlign stage should speed up substantially. Measures the FULL
multilevel_roi_align-equivalent crop (table build + gather + blend) at
the production shapes: b8 x 500 boxes x 7x7 pool, P2..P5 1024px.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from maskrcnn_tpu.ops.roi_align import roi_levels, _crop_core

B, N, POOL, C = 8, 500, 7, 256
SHAPE = (1024, 1024, 3)
ITERS = 10
rng = np.random.RandomState(0)

feats_bf = [rng.randn(B, s, s, C).astype(np.float32) * 0.5
            for s in (256, 128, 64, 32)]
# int8 quantized copies with per-level scales
scales = [np.abs(f).max() / 127.0 for f in feats_bf]
feats_i8 = [np.clip(np.round(f / s), -127, 127).astype(np.int8)
            for f, s in zip(feats_bf, scales)]
feats_bf = [jax.device_put(f.astype(jnp.bfloat16)) for f in feats_bf]
feats_i8 = [jax.device_put(f) for f in feats_i8]

ctr = rng.rand(B, N, 2) * 0.8 + 0.1
sz = rng.rand(B, N, 2) * 0.3 + 0.02
boxes = np.clip(np.concatenate([ctr - sz / 2, ctr + sz / 2], -1), 0, 1)
boxes = jax.device_put(boxes.astype(np.float32))

heights = np.array([256, 128, 64, 32], np.float32)
widths = heights.copy()
h_offsets = np.concatenate([[0], np.cumsum(heights)])[:-1].astype(np.float32)


def crop_bf16(feats, bx):
    def per_image(fs, b):
        lvl = roi_levels(b, SHAPE)
        table = jnp.concatenate(
            [jnp.pad(f, ((0, 0), (0, 256 - f.shape[1]), (0, 0)))
             for f in fs], axis=0)
        return _crop_core(table, b, POOL,
                          jnp.asarray(heights - 1.0)[lvl],
                          jnp.asarray(widths - 1.0)[lvl],
                          jnp.asarray(h_offsets)[lvl])
    return jax.vmap(per_image)(feats, bx)


def _crop_core_i8(table_i32, b, pool_size, h_max, w_max, h_off, sc_lvl):
    """_crop_core with an int32-bitcast int8 table: (2,2,C//4) slices =
    4x fewer gather elements than bf16; dequant after the blend."""
    c4 = table_i32.shape[-1]
    y1, x1, y2, x2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    p = jnp.arange(pool_size, dtype=jnp.float32) / (pool_size - 1)
    in_y = (y1[:, None] + p[None, :] * (y2 - y1)[:, None]) * h_max[:, None]
    in_x = (x1[:, None] + p[None, :] * (x2 - x1)[:, None]) * w_max[:, None]
    out_y = (in_y < 0.0) | (in_y > h_max[:, None])
    out_x = (in_x < 0.0) | (in_x > w_max[:, None])
    ys = jnp.clip(jnp.floor(in_y), 0.0, jnp.maximum(h_max[:, None] - 1, 0))
    xs = jnp.clip(jnp.floor(in_x), 0.0, jnp.maximum(w_max[:, None] - 1, 0))
    ty = jnp.clip(in_y, 0.0, h_max[:, None]) - ys
    tx = jnp.clip(in_x, 0.0, w_max[:, None]) - xs
    n, pp = b.shape[0], pool_size
    sy = jnp.broadcast_to((ys + h_off[:, None])[:, :, None], (n, pp, pp))
    sx = jnp.broadcast_to(xs[:, None, :], (n, pp, pp))
    starts = jnp.stack([sy.reshape(-1), sx.reshape(-1)], 1).astype(jnp.int32)
    idx = jnp.concatenate(
        [starts, jnp.zeros((starts.shape[0], 1), jnp.int32)], 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    g = jax.lax.gather(table_i32, idx, dn, slice_sizes=(2, 2, c4),
                       mode=jax.lax.GatherScatterMode.CLIP)
    patches = jax.lax.bitcast_convert_type(g, jnp.int8)  # [M,2,2,c4,4]
    patches = patches.reshape(n, pp, pp, 2, 2, c4 * 4).astype(jnp.float32)
    wy = jnp.stack([1.0 - ty, ty], -1)
    wx = jnp.stack([1.0 - tx, tx], -1)
    w = wy[:, :, None, :, None] * wx[:, None, :, None, :]
    out = (patches * w[..., None]).sum(axis=(3, 4))
    inside = jnp.logical_not(out_y[:, :, None] | out_x[:, None, :])
    out = jnp.where(inside[..., None], out, 0.0)
    return out * sc_lvl[:, None, None, None]


def crop_i8(feats, bx):
    sc = jnp.asarray(np.array(scales, np.float32))

    def per_image(fs, b):
        lvl = roi_levels(b, SHAPE)
        table = jnp.concatenate(
            [jnp.pad(f, ((0, 0), (0, 256 - f.shape[1]), (0, 0)))
             for f in fs], axis=0)
        ht, wt, c = table.shape
        t32 = jax.lax.bitcast_convert_type(
            table.reshape(ht, wt, c // 4, 4), jnp.int32)
        return _crop_core_i8(t32, b, POOL,
                             jnp.asarray(heights - 1.0)[lvl],
                             jnp.asarray(widths - 1.0)[lvl],
                             jnp.asarray(h_offsets)[lvl], sc[lvl])
    return jax.vmap(per_image)(feats, bx)


def bench(name, fn, feats):
    @jax.jit
    def loop(f, b):
        def body(i, acc):
            out = fn([x + (i % 2).astype(x.dtype) for x in f], b)
            return acc + out.sum(dtype=jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    float(loop(feats, boxes))
    t0 = time.perf_counter()
    float(loop(feats, boxes))
    dt = time.perf_counter() - t0
    print(f"{name}: {1e3*dt/(B*ITERS):.3f} ms/img", flush=True)


# numerical sanity: int8 crop ~ bf16 crop
a = np.asarray(crop_bf16(feats_bf, boxes), np.float32)
g = np.asarray(crop_i8(feats_i8, boxes), np.float32)
rel = np.linalg.norm(a - g) / np.linalg.norm(a)
print(f"rel_l2(int8 vs bf16 crop) = {rel:.4f}")

bench("bf16 table crop", crop_bf16, feats_bf)
bench("int8 table crop", crop_i8, feats_i8)
