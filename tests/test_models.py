"""Shape/structure tests for the model modules on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN, param_count


@pytest.fixture(scope="module")
def model_and_params():
    cfg = TinyConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_fpn_output_shapes(model_and_params):
    model, params = model_and_params
    d = model.config.IMAGE_MAX_DIM
    images = jnp.zeros((1, d, d, 3))
    feats = model.backbone(params, images)
    assert len(feats) == 5
    for f, stride in zip(feats, model.config.BACKBONE_STRIDES):
        assert f.shape == (1, d // stride, d // stride, 256), f.shape


def test_rpn_anchor_alignment(model_and_params):
    """RPN flattened outputs must line up with the anchor count."""
    model, params = model_and_params
    d = model.config.IMAGE_MAX_DIM
    feats = model.backbone(params, jnp.zeros((1, d, d, 3)))
    logits, probs, bbox = model.rpn_detect(params, feats)
    n_anchors = model.config.NUM_ANCHORS
    assert logits.shape == (1, n_anchors, 2)
    assert probs.shape == (1, n_anchors, 2)
    assert bbox.shape == (1, n_anchors, 4)
    assert model.anchors().shape == (n_anchors, 4)
    # probs are a softmax
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_deconv_matmul_equals_convtranspose(rng):
    """DeconvK2S2 (matmul + depth-to-space) must be bit-equal to flax
    ConvTranspose(k=2, s=2, transpose_kernel=True) with shared params,
    forward AND backward."""
    import flax.linen as nn
    import jax

    from maskrcnn_tpu.models.common import DeconvK2S2

    x = jnp.asarray(rng.randn(3, 14, 14, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 6, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    variables = {"params": {"kernel": k, "bias": b}}

    ref = nn.ConvTranspose(6, (2, 2), strides=(2, 2),
                           transpose_kernel=True)
    want = ref.apply(variables, x)
    got = DeconvK2S2(6).apply(variables, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    gref = jax.grad(lambda v: ref.apply(v, x).sum())(variables)
    gnew = jax.grad(lambda v: DeconvK2S2(6).apply(v, x).sum())(variables)
    for key in ("kernel", "bias"):
        np.testing.assert_allclose(np.asarray(gnew["params"][key]),
                                   np.asarray(gref["params"][key]),
                                   rtol=1e-5, atol=1e-5)


def test_rpn_scores_equals_rpn_detect(model_and_params):
    """The fused inference RPN (one 18-chan 1x1, sigmoid(l1-l0) scores)
    must equal rpn_detect consumed as (probs[..., 1], bbox)."""
    model, params = model_and_params
    d = model.config.IMAGE_MAX_DIM
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(2, d, d, 3).astype(np.float32))
    feats = model.backbone(params, images)
    _, probs, bbox = model.rpn_detect(params, feats)
    scores, deltas = model.rpn_scores(params, feats)
    assert scores.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(probs[..., 1]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(deltas, dtype=np.float32),
                               np.asarray(bbox), rtol=1e-5, atol=1e-6)


def test_head_shapes(model_and_params):
    model, params = model_and_params
    k = model.config.NUM_CLASSES
    pooled = jnp.zeros((13, 7, 7, 256))
    logits, probs, bbox = model.classify(params, pooled)
    assert logits.shape == (13, k)
    assert bbox.shape == (13, k, 4)
    masks = model.predict_masks(params, jnp.zeros((13, 14, 14, 256)))
    assert masks.shape == (13, 28, 28, k)
    assert (np.asarray(masks) >= 0).all() and (np.asarray(masks) <= 1).all()


def test_param_count_resnet101():
    """ResNet-101 Mask R-CNN is ~63M params (SURVEY.md section 2.3).
    Uses eval_shape so no actual init compute happens."""
    import jax
    from maskrcnn_tpu.config import CocoConfig
    model = MaskRCNN(CocoConfig())
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(shapes))
    assert 55e6 < n < 75e6, n


def test_frozen_bn_is_affine():
    from maskrcnn_tpu.models.resnet import FrozenBatchNorm
    bn = FrozenBatchNorm(4)
    x = jnp.ones((1, 2, 2, 4))
    params = bn.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.5, params)
    out = bn.apply({"params": params}, x)
    w, b, m, v = (params["weight"], params["bias"], params["running_mean"],
                  params["running_var"])
    expected = (1.0 - m) / np.sqrt(v + 1e-3) * w + b
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expected, rtol=1e-6)
