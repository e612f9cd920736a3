"""Device mesh + data-parallel execution.

The reference has no distributed runtime at all — its `GPU_COUNT` knob
only multiplies a gradient-accumulation counter (reference:
config.py:148-151, model.py:1634-1637). This module is the first-class
replacement (SURVEY.md section 2.3): one `jax.sharding.Mesh` with a data
axis, params replicated, batch sharded, and XLA inserting the `psum`
gradient all-reduce over ICI — the NCCL-equivalent the reference never had.

Scaling recipe (How to Scale Your Model): pick the mesh, annotate the
shardings, let the compiler place collectives. The model is 63M params so
pure DP is the right strategy; the mesh abstraction leaves room for more
axes (e.g. batch-sharded eval sweeps on multi-slice topologies).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.train.step import TrainState, train_step


def make_mesh(num_devices: Optional[int] = None,
              axis: str = "dp") -> Mesh:
    """A 1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "dp"):
    """Shard every batch leaf along its leading (batch) dimension."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def make_parallel_train_step(model: MaskRCNN, optimizer_and_mask,
                             mesh: Mesh, axis: str = "dp"):
    """jit train_step with explicit shardings over the mesh.

    Params/opt-state replicated, batch sharded on the dp axis; the mean
    loss makes XLA emit one reduce-scatter/all-reduce pair per step over
    ICI. Call with state already `replicate`d and batch `shard_batch`ed.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def step(state: TrainState, batch, key):
        return train_step(model, optimizer_and_mask, state, batch, key)

    # `data` as a pytree prefix: every batch leaf shards on its leading
    # (batch) axis, whatever keys the loader provides (packed or not).
    state_sharding = TrainState(step=repl, params=repl, opt_state=repl)
    return jax.jit(
        step,
        in_shardings=(state_sharding, data, repl),
        out_shardings=(state_sharding, repl))


def make_parallel_predict(model: MaskRCNN, mesh: Mesh, axis: str = "dp"):
    """Batch-sharded inference over the mesh (eval sweeps)."""
    from maskrcnn_tpu.detection.pipeline import predict_step

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def run(params, images, windows):
        return predict_step(model, params, images, windows)

    return jax.jit(run, in_shardings=(repl, data, data),
                   out_shardings=data)
