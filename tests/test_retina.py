"""RetinaFPN variant tests: pyramid shapes + one-stage detect smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.retina_fpn import RetinaFPN, RetinaNet


def test_pyramid_shapes():
    """P3..P7 at strides 8..128 (reference fpn/retina_fpn.py:130-137
    prints these shapes as its smoke test)."""
    fpn = RetinaFPN()
    x = jnp.zeros((1, 128, 128, 3))
    params = fpn.init(jax.random.PRNGKey(0), x)
    feats = fpn.apply(params, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 256), (1, 8, 8, 256), (1, 4, 4, 256),
        (1, 2, 2, 256), (1, 1, 1, 256)]


def test_retina_detect_smoke(rng):
    cfg = TinyConfig(DETECTION_MIN_CONFIDENCE=0.0)
    net = RetinaNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    d = cfg.IMAGE_MAX_DIM
    images = jnp.asarray(rng.rand(1, d, d, 3).astype(np.float32))
    out = net.detect(params, images)
    n = cfg.DETECTION_MAX_INSTANCES
    assert out["boxes"].shape == (1, n, 4)
    assert out["scores"].shape == (1, n)
    boxes = np.asarray(out["boxes"][0])
    assert boxes.min() >= 0 and boxes.max() <= d
    # anchors cover 5 levels
    assert net.anchors().shape[1] == 4


def test_retina_focal_loss_trains(rng):
    """Focal+box loss is finite and decreases under SGD on one batch."""
    import optax
    from tests.test_targets import make_gt

    cfg = TinyConfig()
    net = RetinaNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    d = cfg.IMAGE_MAX_DIM
    from maskrcnn_tpu.ops.image import normalize_image
    raw = (rng.rand(2, d, d, 3) * 255).astype(np.uint8)
    images = normalize_image(jnp.asarray(raw), cfg.MEAN_PIXEL)
    g = cfg.MAX_GT_INSTANCES
    cls = np.zeros((2, g), np.int32)
    boxes = np.zeros((2, g, 4), np.float32)
    valid = np.zeros((2, g), bool)
    for i in range(2):
        c, bx, v = make_gt(cfg, rng, 3)
        cls[i], boxes[i], valid[i] = c, bx, v

    key = jax.random.PRNGKey(1)

    def loss_fn(p):
        total, parts = net.losses(p, key, images, jnp.asarray(cls),
                                  jnp.asarray(boxes), jnp.asarray(valid))
        return total

    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.sgd(1e-3, momentum=0.9))
    state = opt.init(params)
    val = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))
    first = float(val(params))
    assert np.isfinite(first)
    for _ in range(4):
        g_ = grad(params)
        updates, state = opt.update(g_, state)
        params = optax.apply_updates(params, updates)
    last = float(val(params))
    assert np.isfinite(last) and last < first, (first, last)
