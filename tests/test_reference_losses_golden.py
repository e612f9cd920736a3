"""Golden-diff the 5-task loss against the reference's own loss methods.

The reference's losses live as methods on its RPN / Classifier / Mask
modules (model.py:652-718, 802-845, 922-953) but never touch `self`, so
they are called unbound on the SAME tensors our jitted
`train/losses.py` consumes. This pins the seams a reimplementation can
silently get wrong: the cross-entropy normalization set (pos+neg
anchors, not all), smooth-L1's beta=1 elementwise form and its
mean-over-gathered-elements denominator, the positives-first packing
convention of the RPN box targets, per-class delta/mask selection, and
the empty-selection zero branches.

Out of scope (deliberate departures, documented in losses.py): the
reference propagates NaN when a nonempty RoI set has zero positives
(torch mean over an empty gather); ours returns 0 — the fixed-shape
masked-mean form. Production never hits that regime (the sampler forces
a positive per gt), so the comparison stays in the defined regime.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from maskrcnn_tpu.train import losses as L
from tests.reference_oracle import load

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    r = load()
    if r is None:
        pytest.skip("reference tree or C toolchain unavailable")
    return r


def _close(ours, theirs, tol=1e-6):
    ours = float(ours)
    theirs = float(theirs)
    assert abs(ours - theirs) <= tol * max(abs(theirs), 1e-3), (ours, theirs)


def test_rpn_class_loss(ref):
    rng = np.random.RandomState(0)
    a = 4000
    match = rng.choice([-1, 0, 0, 0, 1], size=a).astype(np.int32)
    logits = rng.randn(a, 2).astype(np.float32)

    want = ref.model.RPN.class_loss(
        None, torch.from_numpy(match[None, :, None]),
        torch.from_numpy(logits[None]))
    got = L.rpn_class_loss(jnp.asarray(match), jnp.asarray(logits))
    _close(got, want)


@pytest.mark.parametrize("n_pos", [1, 37, 128])
def test_rpn_box_loss(ref, n_pos):
    rng = np.random.RandomState(n_pos)
    a, t = 2000, 128
    match = np.full((a,), -1, np.int32)
    match[rng.choice(a, 600, replace=False)] = 0
    pos_idx = rng.choice(np.where(match == -1)[0], n_pos, replace=False)
    match[pos_idx] = 1
    target = np.zeros((t, 4), np.float32)
    target[:n_pos] = rng.randn(n_pos, 4)
    pred = rng.randn(a, 4).astype(np.float32)

    want = ref.model.RPN.boxes_loss(
        None, torch.from_numpy(target[None]),
        torch.from_numpy(match[None, :, None].astype(np.int64)),
        torch.from_numpy(pred[None]))
    got = L.rpn_box_loss(jnp.asarray(target), jnp.asarray(match),
                         jnp.asarray(pred))
    _close(got, want)


def test_mrn_class_loss(ref):
    rng = np.random.RandomState(3)
    n, k = 100, 81
    ids = rng.randint(0, k, n).astype(np.int32)
    logits = rng.randn(n, k).astype(np.float32)

    want = ref.model.Classifier.class_loss(
        None, torch.from_numpy(ids), torch.from_numpy(logits))
    got = L.mrn_class_loss(jnp.asarray(ids), jnp.asarray(logits),
                           jnp.ones((n,), bool))
    _close(got, want)

    # empty-RoI branch: the reference returns an explicit 0
    want0 = ref.model.Classifier.class_loss(
        None, torch.zeros((0,), dtype=torch.int64),
        torch.zeros((0, k)))
    got0 = L.mrn_class_loss(jnp.asarray(ids), jnp.asarray(logits),
                            jnp.zeros((n,), bool))
    assert float(want0) == 0.0 and float(got0) == 0.0


def test_mrn_box_loss(ref):
    rng = np.random.RandomState(4)
    n, k = 100, 81
    ids = np.zeros(n, np.int32)
    ids[: n // 3] = rng.randint(1, k, n // 3)  # positives first (sampler layout)
    target = rng.randn(n, 4).astype(np.float32)
    pred = rng.randn(n, k, 4).astype(np.float32)

    want = ref.model.Classifier.boxes_loss(
        None, torch.from_numpy(ids), torch.from_numpy(target),
        torch.from_numpy(pred))
    got = L.mrn_box_loss(jnp.asarray(ids), jnp.asarray(target),
                         jnp.asarray(pred), jnp.asarray(ids > 0))
    _close(got, want)


def test_mask_loss(ref):
    rng = np.random.RandomState(5)
    n, k, m = 64, 81, 28
    ids = np.zeros(n, np.int32)
    ids[: n // 2] = rng.randint(1, k, n // 2)
    target = (rng.rand(n, m, m) > 0.5).astype(np.float32)
    # probs away from 0/1 so torch's log clamping never bites
    pred = 1.0 / (1.0 + np.exp(-0.9 * rng.randn(n, k, m, m))).astype(
        np.float32)

    want = ref.model.Mask.mask_loss(
        None, torch.from_numpy(ids), torch.from_numpy(target),
        torch.from_numpy(pred))
    # ours takes [N, m, m, K] (NHWC class-last)
    got = L.mask_loss(jnp.asarray(ids), jnp.asarray(target),
                      jnp.asarray(pred.transpose(0, 2, 3, 1)),
                      jnp.asarray(ids > 0))
    _close(got, want, tol=1e-5)
