"""Bit-packed mask transfer tests."""

import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.ops.bits import pack_masks, unpack_masks


def test_pack_unpack_roundtrip(rng):
    m = (rng.rand(3, 5, 64, 128) > 0.5).astype(np.uint8)
    packed = pack_masks(m)
    assert packed.shape == (3, 5, 64, 16)
    out = np.asarray(unpack_masks(jnp.asarray(packed), 128))
    np.testing.assert_array_equal(out, m)


def test_unpack_non_multiple_width(rng):
    m = (rng.rand(2, 37) > 0.5).astype(np.uint8)
    packed = pack_masks(m)  # pads to 40 bits
    out = np.asarray(unpack_masks(jnp.asarray(packed), 37))
    np.testing.assert_array_equal(out, m)


def test_train_step_packed_equals_unpacked(rng):
    """compute_losses must give identical losses for packed input."""
    import jax
    from maskrcnn_tpu.config import TinyConfig
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.train.step import compute_losses
    from tests.test_train_step import make_batch

    cfg = TinyConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng, 1)
    key = jax.random.PRNGKey(3)
    plain = compute_losses(model, params, key, batch)

    packed = dict(batch)
    packed["gt_masks_packed"] = pack_masks(packed.pop("gt_masks"))
    got = compute_losses(model, params, key, packed)
    for a, b in zip(plain, got):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
