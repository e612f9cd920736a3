"""Canvas-curriculum training: params flow across per-stage re-jits.

fit_canvas_curriculum trains early epochs at a smaller canvas and
finishes at full resolution (the bandwidth-wall workaround ROADMAP.md
names). Verified here on the virtual CPU mesh: two stages at different
canvases (re-jit, different anchors/backbone shapes), cumulative epoch
accounting, a per-stage IMAGES_PER_DEVICE override, loss finiteness,
and that the stage configs derive the scaled IMAGE_MIN_DIM.
"""

from __future__ import annotations

import numpy as np
import jax
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.pipeline import SyntheticLoader
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.train.trainer import fit_canvas_curriculum

pytestmark = pytest.mark.slow


def test_two_stage_curriculum():
    base = TinyConfig(NUM_DEVICES=2, IMAGES_PER_DEVICE=1)
    model = MaskRCNN(base)
    params = model.init(jax.random.PRNGKey(0))

    seen_cfgs = []

    def make_iters(cfg):
        seen_cfgs.append(cfg)
        return iter(SyntheticLoader(cfg, cfg.BATCH_SIZE)), None

    stages = [
        {"canvas": 64, "epochs": 2, "lr": 1e-3, "IMAGES_PER_DEVICE": 2},
        {"canvas": 128, "epochs": 3, "lr": 1e-4},
    ]
    out, trainers = fit_canvas_curriculum(
        base, params, make_iters, stages, jax.random.PRNGKey(1),
        layers="heads", steps_per_epoch=2)

    assert len(trainers) == 2
    # cumulative epoch convention: stage 1 ran 2 epochs, stage 2 ran 1
    assert trainers[0].epoch == 2 and len(trainers[0].loss_history) == 2
    assert trainers[1].epoch == 3 and len(trainers[1].loss_history) == 1

    s0, s1 = seen_cfgs
    assert s0.IMAGE_SHAPE[:2] == (64, 64)
    assert s1.IMAGE_SHAPE[:2] == (128, 128)
    # per-stage batch override took effect (2 devices x 2 images)
    assert s0.BATCH_SIZE == 4 and s1.BATCH_SIZE == 2
    # min-dim scales with the canvas side
    assert s0.IMAGE_MIN_DIM == round(base.IMAGE_MIN_DIM * 64 / 128)

    for tr in trainers:
        for h in tr.loss_history:
            assert np.isfinite(h["total"])

    # params kept the full-resolution-independent structure
    jax.tree_util.tree_map(
        lambda a, b: (np.asarray(a).shape == np.asarray(b).shape)
        or (_ for _ in ()).throw(AssertionError("shape changed")),
        params, out)
