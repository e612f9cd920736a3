"""Trainer orchestration smoke test: epoch loop, logging, checkpoints."""

import jax
import numpy as np

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.pipeline import SyntheticLoader
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.train.trainer import Trainer


def test_trainer_fit_epochs(tmp_path):
    cfg = TinyConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    loader = SyntheticLoader(cfg, batch_size=1)

    trainer = Trainer(model, checkpoint_dir=str(tmp_path), log_every=100)
    out = trainer.fit(params, loader, learning_rate=1e-3, epochs=2,
                      layers="heads", rng=jax.random.PRNGKey(1),
                      val_iter=SyntheticLoader(cfg, 1),
                      steps_per_epoch=2, validation_steps=1)

    assert trainer.epoch == 2
    assert len(trainer.loss_history) == 2
    assert len(trainer.val_loss_history) == 2
    assert np.isfinite(trainer.loss_history[-1]["total"])
    # cumulative-epoch convention: fitting to the same target is a no-op
    out2 = trainer.fit(out, loader, 1e-3, epochs=2, layers="heads",
                       rng=jax.random.PRNGKey(2), steps_per_epoch=2)
    assert trainer.epoch == 2
    # checkpoints saved per epoch
    from maskrcnn_tpu.checkpoint.store import latest_epoch
    assert latest_epoch(str(tmp_path)) == 2
    # params actually moved
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(out)))
    assert moved


def test_plot_loss(tmp_path):
    from maskrcnn_tpu.utils.visualize import plot_loss
    hist = [{"total": 1.0, "rpn_class": 0.5},
            {"total": 0.8, "rpn_class": 0.4}]
    vhist = [{"total": 1.1, "rpn_class": 0.6},
             {"total": 0.9, "rpn_class": 0.5}]
    plot_loss(hist, vhist, save=True, log_dir=str(tmp_path))
    assert (tmp_path / "total.png").exists()
    assert (tmp_path / "rpn_class.png").exists()
