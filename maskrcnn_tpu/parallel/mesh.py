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
              axis: str = "dp", dcn: int = 1, sp: int = 1) -> Mesh:
    """A data-parallel mesh over the first `num_devices` devices.

    `dcn > 1` adds a leading cross-slice axis: the mesh becomes
    (dcn, ici) shaped as ("dcn", axis). Batch shards over the product of
    both axes; the gradient all-reduce then decomposes into a fast
    intra-slice reduce over ICI followed by a small cross-slice reduce
    over DCN (XLA places the collectives given contiguous device order —
    devices within a slice are adjacent in `jax.devices()`).

    `sp > 1` adds a trailing SPATIAL axis: groups of `sp` ICI-adjacent
    chips cooperate on each image, sharding the canvas-H dimension of
    the images (and gt masks) so GSPMD partitions every backbone/RPN
    conv with halo exchanges (collective-permutes) over ICI. Spatial
    partitioning divides the dominant per-image activation memory —
    the escape hatch from the single-chip HBM wall that pins 1024px
    training at b16 (BENCHMARKS.md) and the lever for larger canvases
    or lower batch-1 latency. The global batch shards over the
    remaining (dcn x dp) axes only.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(devices) % (dcn * sp):
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"dcn={dcn} * sp={sp}")
    shape, names = [], []
    if dcn > 1:
        shape.append(dcn)
        names.append("dcn")
    shape.append(len(devices) // (dcn * sp))
    names.append(axis)
    if sp > 1:
        shape.append(sp)
        names.append("sp")
    return Mesh(np.asarray(devices).reshape(shape), tuple(names))


def _data_axes(mesh: Mesh, axis: Optional[str]):
    """The batch-sharding axes: the named axis, or all mesh axes except
    the spatial one."""
    if axis is not None:
        return axis
    return tuple(a for a in mesh.axis_names if a != "sp")


def _data_spec(mesh: Mesh, axis: Optional[str],
               leading_accum: bool = False) -> P:
    """Batch-leading-dim sharding: over the named axis, or over all
    non-spatial mesh axes (dcn x dp product) when axis is None.
    leading_accum=True shards the SECOND dim instead — for
    GRAD_ACCUM_STEPS batches micro-stacked [A, B/A, ...]
    (train.step.split_accum), whose leading axis is the sequential
    accumulation loop, not data."""
    data = _data_axes(mesh, axis)
    return P(None, data) if leading_accum else P(data)


# Canvas-height axis index per batch key (before any leading accum axis):
# images [B, H, W, 3], gt masks [B, G, H, W] (packed: W/8 — H unchanged).
_SPATIAL_AXIS = {"images": 1, "gt_masks": 2, "gt_masks_packed": 2}


def _batch_spec(mesh: Mesh, key: str, axis: Optional[str],
                leading_accum: bool = False) -> P:
    """Per-leaf batch spec: leading batch dim on the data axes, plus —
    on an sp mesh — the canvas-H dim of the spatial leaves on "sp"."""
    data = _data_axes(mesh, axis)
    lead = (None,) if leading_accum else ()
    spec = list(lead) + [data]
    if "sp" in mesh.axis_names and key in _SPATIAL_AXIS:
        pos = len(lead) + _SPATIAL_AXIS[key]
        spec += [None] * (pos - len(spec)) + ["sp"]
    return P(*spec)


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

    On an sp mesh the spatial leaves (`_SPATIAL_AXIS`) additionally
    shard their canvas-H dimension over the "sp" axis — GSPMD then
    partitions the backbone convolutions spatially (halo exchange).

    Multi-process meshes: each process passes its LOCAL shard (from a
    BatchLoader constructed with shard_index=jax.process_index(),
    num_shards=jax.process_count()) and the leaves are assembled into
    one global jax.Array via make_array_from_process_local_data — the
    multi-host data path (SURVEY section 2.3). With sp, each process
    must own whole sp groups (the loader shards rows, not rows x H),
    i.e. the dp width must be divisible by process_count."""
    shardings = {
        k: NamedSharding(mesh, _batch_spec(mesh, k, axis, leading_accum))
        for k in batch
    }
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


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
    # `data` as a pytree prefix: every batch leaf shards on its leading
    # (batch) axis, whatever keys the loader provides (packed or not).
    # On an sp mesh the spec is per-key (spatial leaves also shard H),
    # so the batch arg is left unspecified and inherits the committed
    # shardings `shard_batch` placed.
    data = (None if "sp" in mesh.axis_names else
            NamedSharding(mesh, _data_spec(mesh, axis,
                                           leading_accum=accum > 1)))

    def step(state: TrainState, batch, key):
        return train_step(model, optimizer_and_mask, state, batch, key)

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
    data = (None if "sp" in mesh.axis_names else
            NamedSharding(mesh, _data_spec(mesh, axis)))

    def run(params, key, batch):
        return compute_losses(model, params, key, batch)

    return jax.jit(run, in_shardings=(repl, repl, data))


def make_parallel_predict(model: MaskRCNN, mesh: Mesh,
                          axis: Optional[str] = None):
    """Batch-sharded inference over the mesh (eval sweeps).

    On an sp mesh the canvas-H dim also shards over "sp": the backbone
    and RPN convs run spatially partitioned (sp chips cooperate per
    image — the multi-chip low-latency serving shape), and outputs
    gather back to batch-sharded on the data axes."""
    from maskrcnn_tpu.detection.pipeline import predict_step

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, _data_spec(mesh, axis))
    images_s = NamedSharding(mesh, _batch_spec(mesh, "images", axis))

    def run(params, images, windows):
        return predict_step(model, params, images, windows)

    return jax.jit(run, in_shardings=(repl, images_s, data),
                   out_shardings=data)
