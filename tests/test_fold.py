"""BN folding + space-to-depth stem: numerical equivalence tests.

Both are inference-time rewrites that must be no-ops numerically:
fold_bn_params moves the frozen-BN affine into conv kernels (FOLD_BN
skips the runtime affine), and S2D_STEM lowers the 7x7/2 stem to an
identical 4x4/1 conv on a (2,2)-blocked input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu.checkpoint.fold import fold_bn_params
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN


@pytest.fixture(scope="module")
def setup():
    cfg = TinyConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # make every BN non-trivial so folding is actually exercised
    rng = np.random.RandomState(0)

    def jitter(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        parent = str(getattr(path[-2], "key", path[-2])) if len(path) > 1 \
            else ""
        if "bn" not in parent.lower():
            return leaf
        x = rng.randn(*np.shape(leaf)).astype(np.float32) * 0.2
        if name == "running_var":
            return np.abs(x) + 0.5
        if name in ("weight",):
            return 1.0 + x
        return x

    params = jax.tree_util.tree_map_with_path(jitter, params)
    return cfg, model, params


def _stages(cfg, params, rng):
    """Backbone feats + rpn outputs + head outputs on fixed inputs.

    Unit-scale inputs: with random untrained weights, float
    reassociation drift (fold moves the BN multiply before the conv)
    gets chaotically amplified at relu boundaries through 17+ layers, so
    the comparison needs moderate activation magnitudes. Bit-level fold
    correctness is proven separately in test_fold_single_conv_exact.
    """
    model = MaskRCNN(cfg)
    d = cfg.IMAGE_MAX_DIM
    img = jnp.asarray((rng.rand(2, d, d, 3) * 2 - 1).astype(np.float32))
    feats = model.backbone(params, img)
    rpn = model.rpn_detect(params, feats)
    pooled_box = jnp.asarray(
        rng.rand(6, cfg.POOL_SIZE, cfg.POOL_SIZE, 256).astype(np.float32))
    box = model.classify(params, pooled_box)
    pooled_mask = jnp.asarray(
        rng.rand(6, cfg.MASK_POOL_SIZE, cfg.MASK_POOL_SIZE,
                 256).astype(np.float32))
    masks = model.predict_masks(params, pooled_mask)
    return list(feats) + list(rpn) + list(box) + [masks]


def test_fold_single_conv_exact():
    """One conv+BN pair: folding is exact to float rounding (~1e-7)."""
    import flax.linen as nn

    from maskrcnn_tpu.models.common import Conv
    from maskrcnn_tpu.models.resnet import FrozenBatchNorm

    class Mini(nn.Module):
        fold: bool = False

        @nn.compact
        def __call__(self, x):
            x = Conv(8, (3, 3), padding=((1, 1), (1, 1)),
                     name="conv1")(x)
            return FrozenBatchNorm(8, name="bn1", folded=self.fold)(x)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    p = Mini().init(jax.random.PRNGKey(0), x)["params"]
    p["bn1"] = {
        "weight": 1 + rng.randn(8).astype(np.float32) * 0.2,
        "bias": rng.randn(8).astype(np.float32) * 0.2,
        "running_mean": rng.randn(8).astype(np.float32) * 0.2,
        "running_var": np.abs(rng.randn(8).astype(np.float32)) + 0.5,
    }
    a = Mini().apply({"params": p}, x)
    b = Mini(fold=True).apply({"params": fold_bn_params(p)}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_fold_bn_equivalence(setup):
    cfg, model, params = setup
    base = _stages(cfg, params, np.random.RandomState(1))
    folded = _stages(cfg.replace(FOLD_BN=True), fold_bn_params(params),
                     np.random.RandomState(1))
    for i, (a, b) in enumerate(zip(base, folded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2,
                                   err_msg=f"stage output {i}")


def test_fold_is_idempotent_and_backcompat(setup):
    """Folded params evaluate identically with FOLD_BN=False too (BN
    entries become exact identity), and double-folding is a no-op."""
    cfg, model, params = setup
    folded = fold_bn_params(params)
    a = _stages(cfg.replace(FOLD_BN=True), folded,
                np.random.RandomState(2))
    b = _stages(cfg, folded, np.random.RandomState(2))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)
    twice = fold_bn_params(folded)
    for x, y in zip(jax.tree_util.tree_leaves(folded),
                    jax.tree_util.tree_leaves(twice)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)


def test_s2d_stem_equivalence(setup):
    cfg, model, params = setup
    base = _stages(cfg, params, np.random.RandomState(3))
    s2d = _stages(cfg.replace(S2D_STEM=True), params,
                  np.random.RandomState(3))
    for i, (a, b) in enumerate(zip(base, s2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-2,
                                   err_msg=f"stage output {i}")


def test_s2d_stem_conv_exact():
    """The s2d stem alone matches the plain 7x7/2 conv to float
    rounding, including the pad-alignment edges."""
    from maskrcnn_tpu.models.resnet import StemConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    p = StemConv(16).init(jax.random.PRNGKey(0), x)["params"]
    a = StemConv(16).apply({"params": p}, x)
    b = StemConv(16, s2d=True).apply({"params": p}, x)
    assert a.shape == b.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_combined_predict_step(setup):
    """Full predict pipeline: fold + s2d together track the baseline."""
    from maskrcnn_tpu.detection.pipeline import predict_step

    cfg, model, params = setup
    rng = np.random.RandomState(4)
    d = cfg.IMAGE_MAX_DIM
    images = (rng.rand(1, d, d, 3) * 255).astype(np.uint8)
    windows = np.asarray([[0, 0, d, d]], np.float32)

    base = predict_step(model, params, images, windows)
    fast_cfg = cfg.replace(FOLD_BN=True, S2D_STEM=True)
    fast = predict_step(MaskRCNN(fast_cfg), fold_bn_params(params),
                        images, windows)
    np.testing.assert_array_equal(np.asarray(base["valid"]),
                                  np.asarray(fast["valid"]))
    v = np.asarray(base["valid"])
    np.testing.assert_allclose(np.asarray(base["scores"])[v],
                               np.asarray(fast["scores"])[v],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(base["boxes"])[v],
                               np.asarray(fast["boxes"])[v],
                               rtol=1e-3, atol=0.51)
