import sys, time
sys.path.insert(0, __import__("os").path.dirname(__file__) + "/../..")
import numpy as np, jax, jax.numpy as jnp
from maskrcnn_tpu.ops.mask_paste import paste_masks_packed
from benchmarks.gates.paste_pack_kernel import paste_masks_packed_pallas

print("backend:", jax.default_backend())
rng = np.random.RandomState(0)
B, D, m, H, W = 32, 50, 28, 1024, 1024
N = B * D
masks = jnp.asarray(rng.rand(N, m, m).astype(np.float32))
boxes = []
for _ in range(N):
    y1, x1 = rng.randint(0, 800, 2)
    h, w = rng.randint(30, 400, 2)
    boxes.append([y1, x1, min(y1 + h, H), min(x1 + w, W)])
boxes = jnp.asarray(np.asarray(boxes, np.float32))
valid = jnp.asarray(rng.rand(N) > 0.1)

@jax.jit
def xla_loop(masks, boxes, valid):
    def body(i, acc):
        p = paste_masks_packed(masks + i.astype(jnp.float32) * 0, boxes, valid, H, W)
        return acc + p.sum(dtype=jnp.float32) * 1e-9
    return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

@jax.jit
def pal_loop(masks, boxes, valid):
    def body(i, acc):
        p = paste_masks_packed_pallas(masks + i.astype(jnp.float32) * 0, boxes, valid, H, W)
        return acc + p.sum(dtype=jnp.float32) * 1e-9
    return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

# correctness compiled
w = np.asarray(paste_masks_packed(masks, boxes, valid, H, W))
g = np.asarray(paste_masks_packed_pallas(masks, boxes, valid, H, W))
flips = int(np.unpackbits(w ^ g, axis=-1).sum())
print(f"compiled bit flips: {flips} of {w.size * 8} ({flips / (w.size*8):.2e})")

for name, fn in [("xla", xla_loop), ("pallas", pal_loop)]:
    float(fn(masks, boxes, valid))  # warm
    t0 = time.perf_counter()
    float(fn(masks, boxes, valid))
    dt = (time.perf_counter() - t0) / 4
    print(f"{name}: {dt*1e3:.2f} ms per {N}-det batch ({dt*1e3/B:.3f} ms/img)")
