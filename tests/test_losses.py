"""Loss tests against torch oracles of the reference loss functions.

torch (CPU build, baked into the image) lets us verify the masked-mean
formulations against the exact F.cross_entropy / F.smooth_l1_loss /
F.binary_cross_entropy calls of model.py:652-953.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maskrcnn_tpu.train import losses as L


def test_rpn_class_loss_vs_torch(rng):
    a = 64
    match = rng.choice([-1, 0, 1], a, p=[0.3, 0.5, 0.2]).astype(np.int32)
    logits = rng.randn(a, 2).astype(np.float32)

    got = float(L.rpn_class_loss(jnp.asarray(match), jnp.asarray(logits)))
    idx = np.where(match != 0)[0]
    want = F.cross_entropy(torch.tensor(logits[idx]),
                           torch.tensor((match[idx] == 1).astype(np.int64)))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_rpn_box_loss_vs_torch(rng):
    a, t = 64, 16
    match = np.zeros(a, np.int32)
    pos = rng.choice(a, 5, replace=False)
    match[pos] = 1
    pred = rng.randn(a, 4).astype(np.float32)
    target = np.zeros((t, 4), np.float32)
    target[:5] = rng.randn(5, 4)

    got = float(L.rpn_box_loss(jnp.asarray(target), jnp.asarray(match),
                               jnp.asarray(pred)))
    # reference: gather positives ascending, trim target (model.py:707-716)
    pos_sorted = np.sort(pos)
    want = F.smooth_l1_loss(torch.tensor(pred[pos_sorted]),
                            torch.tensor(target[:5]))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_mrn_class_loss_vs_torch(rng):
    n, k = 32, 9
    cls = rng.randint(0, k, n).astype(np.int32)
    valid = rng.rand(n) > 0.3
    logits = rng.randn(n, k).astype(np.float32)

    got = float(L.mrn_class_loss(jnp.asarray(cls), jnp.asarray(logits),
                                 jnp.asarray(valid)))
    want = F.cross_entropy(torch.tensor(logits[valid]),
                           torch.tensor(cls[valid].astype(np.int64)))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_mrn_box_loss_vs_torch(rng):
    n, k = 32, 9
    cls = rng.randint(0, k, n).astype(np.int32)
    positive = cls > 0
    target = rng.randn(n, 4).astype(np.float32)
    pred = rng.randn(n, k, 4).astype(np.float32)

    got = float(L.mrn_box_loss(jnp.asarray(cls), jnp.asarray(target),
                               jnp.asarray(pred), jnp.asarray(positive)))
    ix = np.where(positive)[0]
    want = F.smooth_l1_loss(
        torch.tensor(pred[ix, cls[ix]]), torch.tensor(target[ix]))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_mask_loss_vs_torch(rng):
    n, k, m = 16, 9, 28
    cls = rng.randint(0, k, n).astype(np.int32)
    positive = cls > 0
    target = (rng.rand(n, m, m) > 0.5).astype(np.float32)
    pred = rng.rand(n, m, m, k).astype(np.float32) * 0.98 + 0.01

    got = float(L.mask_loss(jnp.asarray(cls), jnp.asarray(target),
                            jnp.asarray(pred), jnp.asarray(positive)))
    ix = np.where(positive)[0]
    pred_sel = pred[ix, :, :, :][np.arange(len(ix)), :, :, cls[ix]]
    want = F.binary_cross_entropy(torch.tensor(pred_sel),
                                  torch.tensor(target[ix]))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_losses_zero_when_empty():
    a, t, n, k, m = 16, 8, 8, 5, 28
    zero_match = jnp.zeros((a,), jnp.int32)
    assert float(L.rpn_class_loss(zero_match, jnp.zeros((a, 2)))) == 0.0
    assert float(L.rpn_box_loss(jnp.zeros((t, 4)), zero_match,
                                jnp.zeros((a, 4)))) == 0.0
    novalid = jnp.zeros((n,), bool)
    assert float(L.mrn_class_loss(jnp.zeros((n,), jnp.int32),
                                  jnp.zeros((n, k)), novalid)) == 0.0
    assert float(L.mask_loss(jnp.zeros((n,), jnp.int32),
                             jnp.zeros((n, m, m)),
                             jnp.full((n, m, m, k), 0.5), novalid)) == 0.0
