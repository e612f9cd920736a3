"""Orbax checkpointing with epoch metadata and resume discovery.

Replaces the reference's torch.save-per-epoch + filename-regex resume
(reference: model.py:1045-1093 set_log_dir/load_weights, 1575 save):
checkpoints are orbax directories `epoch_<n>` under the run dir, and
resume picks the highest epoch instead of regex-parsing dates out of
file names.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def checkpoint_path(run_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(run_dir), f"epoch_{epoch:04d}")


_ckptr = None


def _checkpointer():
    """One process-wide StandardCheckpointer (it IS an orbax
    AsyncCheckpointer: save() copies device->host synchronously, then
    writes to disk on a background thread)."""
    global _ckptr
    if _ckptr is None:
        _ckptr = _ocp().StandardCheckpointer()
    return _ckptr


def save_checkpoint(run_dir: str, params: Dict, epoch: int,
                    config=None, block: bool = True) -> str:
    """Save params as `run_dir/epoch_<n>`.

    block=False overlaps the disk write with continued training (the
    Trainer's per-epoch saves): orbax snapshots to host memory before
    returning, so the caller may keep donating/updating the live params;
    call `wait_for_saves()` before reading the files or exiting.
    Partially written checkpoints are invisible to `latest_epoch`
    (orbax writes to a tmp dir and renames on finalize)."""
    path = checkpoint_path(run_dir, epoch)
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(params) if block else params,
               force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def wait_for_saves() -> None:
    """Block until every pending async `save_checkpoint` finished."""
    if _ckptr is not None:
        _ckptr.wait_until_finished()


def prune_checkpoints(run_dir: str, keep_last: int = 5) -> None:
    """Keep the newest `keep_last` epoch checkpoints (plus the one marked
    best, if any); delete the rest. The reference keeps every epoch's
    .pth forever (model.py:1575) — at 170MB+/checkpoint that's the
    difference between a run dir and a disk-full incident."""
    import shutil
    if not os.path.isdir(run_dir):
        return
    epochs = sorted(
        int(m.group(1)) for m in
        (re.fullmatch(r"epoch_(\d{4})", n) for n in os.listdir(run_dir))
        if m)
    best = best_epoch(run_dir)
    for e in epochs[:-keep_last] if keep_last > 0 else []:
        if e == best:
            continue
        shutil.rmtree(checkpoint_path(run_dir, e), ignore_errors=True)


def mark_best(run_dir: str, epoch: int) -> None:
    """Record the best-metric epoch (e.g. highest val AP); protected from
    pruning and loadable via `load_checkpoint(run_dir, p, best_epoch(d))`."""
    with open(os.path.join(os.path.abspath(run_dir), "BEST"), "w") as f:
        f.write(str(int(epoch)))


def best_epoch(run_dir: str) -> Optional[int]:
    path = os.path.join(os.path.abspath(run_dir), "BEST")
    if not os.path.exists(path):
        return None
    try:
        return int(open(path).read().strip())
    except ValueError:
        return None


def latest_epoch(run_dir: str) -> Optional[int]:
    """Find the newest epoch checkpoint (replaces model.py:1059-1069)."""
    if not os.path.isdir(run_dir):
        return None
    best = None
    for name in os.listdir(run_dir):
        m = re.fullmatch(r"epoch_(\d{4})", name)
        if m:
            e = int(m.group(1))
            best = e if best is None else max(best, e)
    return best


def load_checkpoint(run_dir_or_path: str, params_like: Dict,
                    epoch: Optional[int] = None) -> Tuple[Dict, int]:
    """Load params (shape/dtype template = params_like). Returns
    (params, epoch). If `run_dir_or_path` is a run dir, loads the given
    or latest epoch."""
    ocp = _ocp()
    path = run_dir_or_path
    if not os.path.basename(path).startswith("epoch_"):
        e = epoch if epoch is not None else latest_epoch(path)
        if e is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = checkpoint_path(path, e)
    else:
        e = int(os.path.basename(path).split("_")[1])
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(np.asarray, jax.device_get(params_like))
    # A template with optional branches (kp_head, cascade box_head2/3)
    # may be restoring a checkpoint from before the branch existed
    # (fine-tune-the-new-branch flow): orbax rejects the structural
    # mismatch, so probe the on-disk tree and restore without the
    # absent subtrees. load_params re-attaches their init values.
    meta = ckptr.metadata(os.path.abspath(path))
    tree = getattr(meta, "item_metadata", meta)
    if tree is not None:
        absent = [k for k in template if k not in tree]
        if absent:
            template = {k: v for k, v in template.items()
                        if k not in absent}
    params = ckptr.restore(os.path.abspath(path), template)
    return params, e


def load_params(path: str, params_like: Dict,
                architecture: str = "resnet101",
                reinit_mismatched: bool = False) -> Dict:
    """Polyglot load: .pth (torch) or orbax dir, shape-checked against
    the template. Covers the reference CLI's --model flag surface
    (coco.py:163-168).

    reinit_mismatched: keep the template's (freshly initialized) value
    for any leaf whose checkpoint shape disagrees — the fine-tune flow
    for a different NUM_CLASSES/NUM_KEYPOINTS, where the class-dependent
    head tails re-train while everything else transfers (the
    matterport-lineage `load_weights(exclude=...)` workflow, made
    automatic: only genuinely incompatible leaves reinitialize).
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        from maskrcnn_tpu.checkpoint.torch_convert import \
            load_torch_checkpoint
        params = load_torch_checkpoint(path, architecture)
    elif not reinit_mismatched:
        params, _ = load_checkpoint(path, params_like)
    else:
        # restore with the ON-DISK shapes (a shape-mismatched template
        # would make orbax fail), then merge leaf-wise below
        p = path
        if not os.path.basename(p).startswith("epoch_"):
            e = latest_epoch(p)
            if e is None:
                raise FileNotFoundError(f"no checkpoints under {p}")
            p = checkpoint_path(p, e)
        params = _ocp().StandardCheckpointer().restore(os.path.abspath(p))
    missing = [k for k in params_like if k not in params]
    if missing:
        # checkpoint predates an optional branch (keypoint head,
        # cascade box heads): the new branch keeps its init weights
        # (fine-tune-the-new-branch flow)
        print(f"checkpoint lacks {missing} — these branches keep "
              "their initialization")
        params = dict(params)
        for k in missing:
            params[k] = params_like[k]
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, params_like)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    if ref_shapes != got_shapes:
        if not reinit_mismatched:
            raise ValueError(
                "checkpoint shapes do not match the model (pass "
                "reinit_mismatched=True to keep freshly initialized "
                "values for incompatible leaves, e.g. when fine-tuning "
                "to a different NUM_CLASSES)")
        reinit = []

        def merge(kp, template_leaf, ckpt_leaf):
            if np.shape(template_leaf) == np.shape(ckpt_leaf):
                return ckpt_leaf
            reinit.append(jax.tree_util.keystr(kp))
            return np.asarray(template_leaf)

        params = jax.tree_util.tree_map_with_path(merge, params_like,
                                                  params)
        print(f"reinitialized {len(reinit)} shape-mismatched leaves: "
              + ", ".join(reinit))
    return params
