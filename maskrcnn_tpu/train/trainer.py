"""Training driver: layer-freezing presets, stage schedule, epoch loop.

Rebuild of the reference training surface (reference: model.py:1490-1747
train_model/train_epoch/valid_epoch; coco.py:217-241 3-stage schedule).
The per-step work is one jitted `train_step` on device; this module only
orchestrates stages, learning rates, logging and checkpoints.
"""

from __future__ import annotations

import dataclasses
import re
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.train.step import TrainState, make_optimizer

# Layer presets (reference: model.py:1509-1523), translated from the
# torch module names to our param-tree paths.
LAYER_REGEX = {
    "heads": r"(fpn/P[2-5]_.*)|(rpn/.*)|(box_head/.*)|(mask_head/.*)",
    "3+": (r"(fpn/resnet/C[3-5]/.*)|(fpn/P[2-5]_.*)|(rpn/.*)"
           r"|(box_head/.*)|(mask_head/.*)"),
    "4+": (r"(fpn/resnet/C[4-5]/.*)|(fpn/P[2-5]_.*)|(rpn/.*)"
           r"|(box_head/.*)|(mask_head/.*)"),
    "5+": (r"(fpn/resnet/C5/.*)|(fpn/P[2-5]_.*)|(rpn/.*)"
           r"|(box_head/.*)|(mask_head/.*)"),
    "all": r".*",
}


def param_paths(params) -> List[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, _ in flat:
        out.append("/".join(str(getattr(k, "key", k)) for k in path))
    return out


def _is_bn(path: str) -> bool:
    """BatchNorm params are never trainable (reference freezes them at
    build: model.py:1010-1016, and set_trainable never re-enables)."""
    return "bn" in path.lower()


def trainable_mask(params, layer_regex: str):
    """Bool pytree: True where the param receives gradient updates."""
    pattern = re.compile(layer_regex)

    def mask_one(path, _):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        return bool(pattern.fullmatch(p)) and not _is_bn(p)

    return jax.tree_util.tree_map_with_path(mask_one, params)


def decay_mask(params, layer_regex: str):
    """Weight decay applies to trainable non-BN params only
    (model.py:1542-1553); BN exclusion is implied by trainability."""
    return trainable_mask(params, layer_regex)


@dataclasses.dataclass
class Trainer:
    """Stage-wise trainer (reference: model.py:1490-1577 train_model).

    When `config.NUM_DEVICES > 1`, every stage runs the mesh-parallel
    train step: params/opt-state replicated, batches sharded on the dp
    axis, gradients all-reduced by XLA over ICI (SURVEY section 2.3 —
    the real replacement for the reference's fake GPU_COUNT knob)."""

    model: MaskRCNN
    checkpoint_dir: Optional[str] = None
    log_every: int = 10
    # retain only the newest N epoch checkpoints (+ any marked best);
    # 0 disables pruning (the reference keeps every epoch forever)
    keep_last: int = 5

    def __post_init__(self):
        self.loss_history: List[Dict[str, float]] = []
        self.val_loss_history: List[Dict[str, float]] = []
        self.epoch = 0

    def try_resume(self, params):
        """Resume from the newest epoch checkpoint in checkpoint_dir
        (replaces the reference's filename-regex resume,
        model.py:1045-1093). Returns (params, resumed: bool)."""
        if not self.checkpoint_dir:
            return params, False
        from maskrcnn_tpu.checkpoint.store import (latest_epoch,
                                                   load_checkpoint)
        epoch = latest_epoch(self.checkpoint_dir)
        if epoch is None:
            return params, False
        params, self.epoch = load_checkpoint(self.checkpoint_dir, params,
                                             epoch)
        print(f"Resuming from epoch {self.epoch} checkpoint in "
              f"{self.checkpoint_dir}")
        return params, True

    def _plot_losses(self):
        """Per-epoch loss PNGs into the log dir (reference writes 6 plots
        per epoch: model.py:1568-1572 via utils.py:401-488)."""
        if not self.checkpoint_dir or not self.loss_history:
            return
        try:
            from maskrcnn_tpu.utils.visualize import plot_loss
            plot_loss(self.loss_history, self.val_loss_history,
                      log_dir=self.checkpoint_dir)
        except Exception as e:  # plotting must never kill training
            print(f"  WARNING: loss plot failed: {e}")

    def fit(self, params, train_iter: Iterable, learning_rate: float,
            epochs: int, layers: str, rng: jax.Array,
            val_iter: Optional[Iterable] = None,
            steps_per_epoch: Optional[int] = None,
            validation_steps: Optional[int] = None,
            on_epoch_end: Optional[Callable] = None):
        """Train until `epochs` total epochs, like the reference's
        cumulative-epoch convention (model.py:1494-1497, 1559).
        Returns the final params.
        """
        cfg = self.model.config
        layer_regex = LAYER_REGEX.get(layers, layers)
        steps_per_epoch = steps_per_epoch or cfg.STEPS_PER_EPOCH
        validation_steps = validation_steps or cfg.VALIDATION_STEPS

        # New optimizer per stage: momentum buffers reset exactly like the
        # reference's fresh optim.SGD per train_model call (model.py:1550).
        tmask = trainable_mask(params, layer_regex)
        optimizer = make_optimizer(cfg, learning_rate,
                                   decay_mask(params, layer_regex))
        opt_and_mask = (optimizer, lambda p, _m=tmask: _m)
        state = TrainState(step=np.int32(0), params=params,
                           opt_state=optimizer.init(params))

        # One code path for 1..N devices: a NUM_DEVICES-wide dp mesh with
        # the donated parallel step (a 1-device mesh degenerates to plain
        # jit + donation; XLA inserts no collectives).
        from maskrcnn_tpu.parallel import (make_mesh,
                                           make_parallel_eval_losses,
                                           make_parallel_train_step,
                                           replicate, shard_batch)
        mesh = make_mesh(cfg.NUM_DEVICES, axis=cfg.MESH_AXIS_DP,
                         sp=cfg.SP_DEVICES)
        pstep = make_parallel_train_step(self.model, opt_and_mask,
                                         mesh, axis=cfg.MESH_AXIS_DP)
        # validation mirrors the train path: params replicated, batch
        # sharded on the dp axes (reference valid_epoch: model.py:1670)
        peval = make_parallel_eval_losses(self.model, mesh,
                                          axis=cfg.MESH_AXIS_DP)
        # replicate copies (may_alias=False), so pstep's donation of the
        # state never consumes the caller's param buffers
        state = replicate(state, mesh)
        if cfg.NUM_DEVICES > 1:
            kind = ("Data-parallel" if cfg.SP_DEVICES == 1
                    else "Data+spatial-parallel")
            print(f"{kind} mesh: {dict(mesh.shape)} "
                  f"(global batch {cfg.BATCH_SIZE})")

        for epoch in range(self.epoch + 1, epochs + 1):
            t0 = time.time()
            # Per-step metrics stay ON DEVICE until a log point or epoch
            # end: a float() every step is a host-device round-trip that
            # stalls the dispatch pipeline (30+ ms over a remote link vs
            # a ~0.7 s step — and the whole step time at small scales).
            # The non-finite guard runs IN-GRAPH (train_step keeps the
            # old state), so nothing on the host needs per-step truth;
            # skipped steps are reported at log points and counted at
            # epoch end. Each metrics dict is 6 scalars — holding an
            # epoch of them costs nothing.
            pending = []
            for step in range(steps_per_epoch):
                batch = next(train_iter)
                rng, key = jax.random.split(rng)
                if cfg.GRAD_ACCUM_STEPS > 1:
                    from maskrcnn_tpu.train.step import split_accum
                    batch = shard_batch(
                        split_accum(batch, cfg.GRAD_ACCUM_STEPS), mesh,
                        leading_accum=True)
                else:
                    batch = shard_batch(batch, mesh)
                state, metrics = pstep(state, batch, replicate(key, mesh))
                pending.append(metrics)
                # bound host run-ahead to 2 in-flight steps: enough to
                # overlap host data work with device compute, without
                # piling queued batch buffers (hundreds of MB each at
                # 1024px) into HBM ahead of the device
                if step >= 2:
                    jax.block_until_ready(pending[step - 2]["total"])
                if (step + 1) % self.log_every == 0 or step == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    if not np.isfinite(m["total"]):
                        print(f"  WARNING: non-finite loss at epoch "
                              f"{epoch} step {step + 1}; step skipped "
                              "in-graph")
                    print(f"  epoch {epoch} step {step + 1}/"
                          f"{steps_per_epoch} " +
                          " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            # one bulk fetch for the epoch (device compute already done)
            vals = jax.device_get(pending)
            finite = [v for v in vals if np.isfinite(v["total"])]
            if len(finite) < len(vals):
                print(f"  WARNING: {len(vals) - len(finite)} non-finite "
                      f"step(s) in epoch {epoch} were skipped in-graph")
            sums = {k: float(sum(v[k] for v in finite)) / steps_per_epoch
                    for k in vals[0]} if vals else {}
            self.loss_history.append(sums)

            if val_iter is not None:
                vpending = []
                for _ in range(validation_steps):
                    batch = next(val_iter)
                    rng, key = jax.random.split(rng)
                    batch = shard_batch(batch, mesh)
                    vpending.append(peval(state.params,
                                          replicate(key, mesh),
                                          batch).as_dict())
                    if len(vpending) > 2:  # same run-ahead bound
                        jax.block_until_ready(
                            vpending[len(vpending) - 3]["total"])
                vvals = jax.device_get(vpending)  # one bulk fetch
                vsums = {k: float(sum(v[k] for v in vvals))
                         / validation_steps
                         for k in vvals[0]} if vvals else {}
                self.val_loss_history.append(vsums)

            self.epoch = epoch
            print(f"epoch {epoch} done in {time.time() - t0:.1f}s: "
                  + " ".join(f"{k}={v:.4f}"
                             for k, v in self.loss_history[-1].items()))
            if self.checkpoint_dir:
                from maskrcnn_tpu.checkpoint.store import (
                    prune_checkpoints, save_checkpoint)
                # async: the disk write overlaps the next epoch (orbax
                # snapshots to host before returning, so the donated/
                # updated live params are safe); waited on at fit end.
                save_checkpoint(self.checkpoint_dir, state.params,
                                epoch, self.model.config, block=False)
                prune_checkpoints(self.checkpoint_dir, self.keep_last)
            self._plot_losses()
            if on_epoch_end is not None:
                on_epoch_end(self, state.params)

        if self.checkpoint_dir:
            from maskrcnn_tpu.checkpoint.store import wait_for_saves
            wait_for_saves()
        return jax.device_get(state.params)

    def fit_coco_schedule(self, params, train_iter, rng,
                          val_iter=None, **kw):
        """The reference 3-stage schedule (coco.py:217-241): heads to 40,
        4+ to 120, all to 160 at LR/10."""
        lr = self.model.config.LEARNING_RATE
        params = self.fit(params, train_iter, lr, 40, "heads", rng,
                          val_iter=val_iter, **kw)
        params = self.fit(params, train_iter, lr, 120, "4+", rng,
                          val_iter=val_iter, **kw)
        params = self.fit(params, train_iter, lr / 10.0, 160, "all", rng,
                          val_iter=val_iter, **kw)
        return params


def fit_canvas_curriculum(base_config, params, make_iters, stages,
                          rng, layers: str = "all",
                          checkpoint_dir: Optional[str] = None,
                          **fit_kw):
    """Multi-scale canvas curriculum over `Trainer.fit` stages.

    Training at 1024px is HBM-bandwidth-walled (BENCHMARKS.md); a
    curriculum runs early epochs at a smaller canvas — a 512px step
    moves ~1/4 the activation bytes, so the same optimizer work costs a
    fraction of the wall clock — and finishes at full resolution for
    protocol-faithful detection heads. Conv/BN/head weights are
    resolution-independent, so params flow across stages unchanged;
    static-shape jax re-jits each stage at its canvas (anchors,
    backbone shapes and loaders all re-derive from the stage config).
    This is an opt-in departure from the reference protocol (square
    1024 everywhere, reference model.py:978-983 + config.py:83-90),
    like IMAGE_CANVAS and QUANT_INT8.

    stages: list of dicts: {"canvas": int | (H, W), "epochs": E
        (cumulative, Trainer.fit convention), "lr": float (defaults to
        config.LEARNING_RATE), ...any Config field overrides (e.g.
        IMAGES_PER_DEVICE — smaller canvases fit bigger batches)}.
    make_iters(cfg) -> (train_iter, val_iter | None): build that
        stage's loaders (canvas-dependent shapes).
    Returns (params, trainers) — one Trainer per stage with its loss
    history; checkpoints share `checkpoint_dir` with a continuing
    epoch counter.
    """
    trainers = []
    epoch = 0
    for stage in stages:
        stage = dict(stage)
        canvas = stage.pop("canvas")
        epochs = stage.pop("epochs")
        lr = stage.pop("lr", base_config.LEARNING_RATE)
        if isinstance(canvas, int):
            canvas = (canvas, canvas)
        side = max(canvas)
        overrides = dict(
            IMAGE_CANVAS=tuple(canvas),
            IMAGE_MAX_DIM=side,
            # keep the reference's min/max ratio so the resize policy
            # scales with the canvas
            IMAGE_MIN_DIM=max(1, round(base_config.IMAGE_MIN_DIM
                                       * side / base_config.IMAGE_MAX_DIM)),
        )
        overrides.update(stage)
        cfg = base_config.replace(**overrides)
        model = MaskRCNN(cfg)
        trainer = Trainer(model, checkpoint_dir=checkpoint_dir)
        trainer.epoch = epoch
        train_iter, val_iter = make_iters(cfg)
        print(f"curriculum stage: canvas {cfg.IMAGE_SHAPE[:2]} to epoch "
              f"{epochs} (batch {cfg.BATCH_SIZE}, lr {lr})")
        rng, stage_rng = jax.random.split(rng)
        params = trainer.fit(params, train_iter, lr, epochs, layers,
                             stage_rng, val_iter=val_iter, **fit_kw)
        epoch = trainer.epoch
        trainers.append(trainer)
    return params, trainers
