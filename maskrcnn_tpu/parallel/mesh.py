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
              axis: str = "dp", dcn: int = 1) -> Mesh:
    """A data-parallel mesh over the first `num_devices` devices.

    `dcn > 1` adds a leading cross-slice axis: the mesh becomes
    (dcn, ici) shaped as ("dcn", axis). Batch shards over the product of
    both axes; the gradient all-reduce then decomposes into a fast
    intra-slice reduce over ICI followed by a small cross-slice reduce
    over DCN (XLA places the collectives given contiguous device order —
    devices within a slice are adjacent in `jax.devices()`).
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if dcn > 1:
        if len(devices) % dcn:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"dcn={dcn}")
        return Mesh(np.asarray(devices).reshape(dcn, -1), ("dcn", axis))
    return Mesh(np.asarray(devices), (axis,))


def _data_spec(mesh: Mesh, axis: Optional[str],
               leading_accum: bool = False) -> P:
    """Batch-leading-dim sharding: over the named axis, or over ALL mesh
    axes (dcn x dp product) when axis is None. leading_accum=True
    shards the SECOND dim instead — for GRAD_ACCUM_STEPS batches
    micro-stacked [A, B/A, ...] (train.step.split_accum), whose leading
    axis is the sequential accumulation loop, not data."""
    data = tuple(mesh.axis_names) if axis is None else axis
    return P(None, data) if leading_accum else P(data)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh.

    Never aliases the input buffers: replicated state is what
    `make_parallel_train_step` donates, and donating an aliased buffer
    would delete the caller's original arrays (device_put's
    may_alias=False does NOT prevent this — shard 0 of the replicated
    array still shares the source buffer — so copy explicitly)."""
    import jax.numpy as jnp
    sharding = NamedSharding(mesh, P())
    copied = jax.tree_util.tree_map(jnp.array, tree)
    return jax.device_put(copied, sharding)


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: Optional[str] = None,
                leading_accum: bool = False):
    """Shard every batch leaf along its leading (batch) dimension over
    all mesh axes (or one named axis). leading_accum=True expects
    micro-stacked [A, B/A, ...] leaves (train.step.split_accum) and
    shards the second dim.

    Multi-process meshes: each process passes its LOCAL shard (from a
    BatchLoader constructed with shard_index=jax.process_index(),
    num_shards=jax.process_count()) and the leaves are assembled into
    one global jax.Array via make_array_from_process_local_data — the
    multi-host data path (SURVEY section 2.3)."""
    sharding = NamedSharding(mesh, _data_spec(mesh, axis, leading_accum))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return jax.device_put(batch, sharding)


def make_parallel_train_step(model: MaskRCNN, optimizer_and_mask,
                             mesh: Mesh, axis: Optional[str] = None):
    """jit train_step with explicit shardings over the mesh.

    Params/opt-state replicated, batch sharded on the data axes; the mean
    loss makes XLA emit one reduce-scatter/all-reduce pair per step over
    ICI (then DCN for a 2-axis mesh). Call with state already
    `replicate`d and batch `shard_batch`ed. The state is donated — the
    caller must not reuse the input state after the call (the non-finite
    skip guard lives inside train_step, so no caller rollback is needed).
    """
    repl = NamedSharding(mesh, P())
    accum = getattr(model.config, "GRAD_ACCUM_STEPS", 1)
    data = NamedSharding(mesh, _data_spec(mesh, axis,
                                          leading_accum=accum > 1))

    def step(state: TrainState, batch, key):
        return train_step(model, optimizer_and_mask, state, batch, key)

    # `data` as a pytree prefix: every batch leaf shards on its leading
    # (batch) axis, whatever keys the loader provides (packed or not).
    state_sharding = TrainState(step=repl, params=repl, opt_state=repl)
    return jax.jit(
        step,
        in_shardings=(state_sharding, data, repl),
        out_shardings=(state_sharding, repl),
        donate_argnums=(0,))


def make_parallel_eval_losses(model: MaskRCNN, mesh: Mesh,
                              axis: Optional[str] = None):
    """jit compute_losses with explicit shardings over the mesh.

    The validation loop must mirror the train path (replicated params,
    batch sharded on the data axes) — feeding a process-local numpy
    batch into a plain jit next to mesh-replicated params either errors
    (multi-host: the batch is not globally addressable) or silently
    loses the data-parallel speedup. Call with batch `shard_batch`ed.
    """
    from maskrcnn_tpu.train.step import compute_losses

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, _data_spec(mesh, axis))

    def run(params, key, batch):
        return compute_losses(model, params, key, batch)

    return jax.jit(run, in_shardings=(repl, repl, data))


def make_parallel_predict(model: MaskRCNN, mesh: Mesh,
                          axis: Optional[str] = None):
    """Batch-sharded inference over the mesh (eval sweeps)."""
    from maskrcnn_tpu.detection.pipeline import predict_step

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, _data_spec(mesh, axis))

    def run(params, images, windows):
        return predict_step(model, params, images, windows)

    return jax.jit(run, in_shardings=(repl, data, data),
                   out_shardings=data)
