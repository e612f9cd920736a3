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
