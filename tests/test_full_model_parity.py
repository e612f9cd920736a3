"""Full-model numerical parity: flax model == torch oracle.

Random flax params are exported through the converter into a
structurally-identical torch model (tests/torch_oracle.py, written from
this framework's own specs); both run the same input. This validates
end-to-end: every layer's padding/stride/upsample/deconv convention and
the converter's layout transposes — the exact machinery a real
`mask_rcnn_coco.pth` will flow through.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from maskrcnn_tpu.checkpoint.torch_convert import to_torch_state_dict
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from tests.torch_oracle import OracleMaskRCNN


@pytest.fixture(scope="module")
def pair():
    cfg = TinyConfig()  # resnet50, f32, 128px
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(7))
    # randomise BN stats too so folding is actually exercised
    def jitter(path, p):
        name = str(path[-1])
        if "running_mean" in name:
            return p + 0.3
        if "running_var" in name:
            return p * 1.7 + 0.1
        return p
    params = jax.tree_util.tree_map_with_path(jitter, params)

    sd = {k: torch.tensor(v)
          for k, v in to_torch_state_dict(params, cfg.BACKBONE).items()}
    oracle = OracleMaskRCNN(cfg.BACKBONE, cfg.NUM_CLASSES)
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    # only BN bookkeeping may be missing; nothing unexpected
    assert not unexpected, unexpected[:5]
    assert all("num_batches_tracked" in m for m in missing), missing[:5]
    oracle.eval()
    return TinyConfig(), MaskRCNN(TinyConfig()), params, oracle


def test_backbone_fpn_parity(pair, rng):
    cfg, model, params, oracle = pair
    d = cfg.IMAGE_MAX_DIM
    x = rng.randn(1, d, d, 3).astype(np.float32) * 30
    feats = model.backbone(params, jnp.asarray(x))
    with torch.no_grad():
        tfeats = oracle.fpn(torch.tensor(x.transpose(0, 3, 1, 2)))
    for i, (f, tf) in enumerate(zip(feats, tfeats)):
        got = np.asarray(f).transpose(0, 3, 1, 2)
        want = tf.numpy()
        scale = np.abs(want).max() + 1e-6
        err = np.abs(got - want).max() / scale
        assert err < 2e-3, f"P{i + 2}: rel err {err}"


def test_rpn_parity(pair, rng):
    cfg, model, params, oracle = pair
    x = rng.randn(1, 16, 16, 256).astype(np.float32)
    logits, _, bbox = model.rpn.apply(
        {"params": params["rpn"]}, jnp.asarray(x))
    with torch.no_grad():
        tl, tb = oracle.rpn(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bbox), tb.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_box_head_parity(pair, rng):
    cfg, model, params, oracle = pair
    pooled = rng.randn(5, 7, 7, 256).astype(np.float32)
    logits, _, deltas = model.classify(params, jnp.asarray(pooled))
    with torch.no_grad():
        tl, td = oracle.classifier(
            torch.tensor(pooled.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(deltas), td.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_mask_head_parity(pair, rng):
    cfg, model, params, oracle = pair
    pooled = rng.randn(3, 14, 14, 256).astype(np.float32)
    masks = model.predict_masks(params, jnp.asarray(pooled))
    with torch.no_grad():
        tm = oracle.mask(torch.tensor(pooled.transpose(0, 3, 1, 2)))
    got = np.asarray(masks).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, tm.numpy(), rtol=1e-3, atol=1e-4)
