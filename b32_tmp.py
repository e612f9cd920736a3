import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
from bench import make_loop
from maskrcnn_tpu.config import CocoInferenceConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
cfg = CocoInferenceConfig()
model = MaskRCNN(cfg)
params = jax.device_put(model.init(jax.random.PRNGKey(0)))
d = cfg.IMAGE_MAX_DIM
rng = np.random.RandomState(0)
for b in (32, 24):
    try:
        images = jax.device_put(rng.randint(0, 200, (b, d, d, 3)).astype(np.uint8))
        windows = jax.device_put(np.tile([[0,0,d,d]], (b,1)).astype(np.float32))
        loop = make_loop(model, 8)
        float(loop(params, images, windows))
        t0 = time.perf_counter(); v = float(loop(params, images, windows)); dt = time.perf_counter()-t0
        print(f"batch {b}: {b*8/dt:.2f} img/s", flush=True)
    except Exception as e:
        print(f"batch {b} failed: {type(e).__name__}", flush=True)
