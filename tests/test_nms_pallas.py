"""Pallas NMS kernel vs the reference oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import maskrcnn_tpu.ops.nms_pallas as NP
from tests.test_nms import np_nms, rand_dets


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(NP.pl, "pallas_call", patched)


def test_pallas_nms_matches_oracle(rng):
    for trial in range(4):
        n = [50, 64, 100, 130][trial]
        thr = [0.3, 0.5, 0.7, 0.5][trial]
        dets = rand_dets(rng, n)
        order = np.argsort(-dets[:, 4], kind="stable")
        keep = np.asarray(NP.nms_mask_pallas.__wrapped__(
            jnp.asarray(dets[order, :4]), jnp.ones(n, bool), thr))
        assert set(order[keep].tolist()) == set(np_nms(dets, thr).tolist())


def test_pallas_nms_valid_mask(rng):
    dets = rand_dets(rng, 96)
    order = np.argsort(-dets[:, 4], kind="stable")
    valid = np.ones(96, bool)
    valid[64:] = False
    keep = np.asarray(NP.nms_mask_pallas.__wrapped__(
        jnp.asarray(dets[order, :4]), jnp.asarray(valid), 0.5))
    assert not keep[64:].any()
    want = set(np_nms(dets[order[:64]], 0.5).tolist())
    assert set(np.where(keep[:64])[0].tolist()) == want
