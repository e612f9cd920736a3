"""Torch checkpoint <-> flax param-tree conversion.

Converts the reference's `mask_rcnn_coco.pth` state dict (the torch module
tree of reference model.py:959-1007: fpn.C1..C5 Sequentials, fpn.P*_conv*,
rpn.*, classifier.*, mask.*) into this framework's NHWC flax parameter
pytree, and back.

Layout conventions:
* Conv2d weight [O, I, kh, kw]  -> flax kernel [kh, kw, I, O]
* Linear weight [O, I]          -> flax kernel [I, O]
* ConvTranspose2d weight [I, O, kh, kw] -> flax kernel [kh, kw, O, I]
  (ConvTranspose(transpose_kernel=True) == torch semantics)
* BatchNorm weight/bias/running_mean/running_var copy through unchanged
  (FrozenBatchNorm stores them verbatim; `num_batches_tracked` dropped).

The mapping is generated programmatically from the architecture spec, so
resnet50/resnet101 and any NUM_CLASSES work.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _blocks_per_stage(architecture: str) -> List[int]:
    return {"resnet50": [3, 4, 6, 3],
            "resnet101": [3, 4, 23, 3]}[architecture]


def name_map(architecture: str = "resnet101") -> List[Tuple[str, str, str]]:
    """[(torch_prefix, flax_path_prefix, kind)] for every weighted module.

    kind: conv | convT | linear | bn. flax paths use '/' separators into
    the params pytree.
    """
    out: List[Tuple[str, str, str]] = []
    # C1 stem (torch Sequential: 0=conv, 1=bn; reference model.py:223-229)
    out.append(("fpn.C1.0", "fpn/resnet/C1_conv", "conv"))
    out.append(("fpn.C1.1", "fpn/resnet/C1_bn", "bn"))
    # Residual stages
    for stage, blocks in zip((2, 3, 4, 5), _blocks_per_stage(architecture)):
        for i in range(blocks):
            t = f"fpn.C{stage}.{i}"
            f = f"fpn/resnet/C{stage}/block{i}"
            for j in (1, 2, 3):
                out.append((f"{t}.conv{j}", f"{f}/conv{j}", "conv"))
                out.append((f"{t}.bn{j}", f"{f}/bn{j}", "bn"))
            if i == 0:
                out.append((f"{t}.downsample.0", f"{f}/downsample_conv",
                            "conv"))
                out.append((f"{t}.downsample.1", f"{f}/downsample_bn",
                            "bn"))
    # FPN neck: P*_conv1 plain convs; P*_conv2 are Sequential(SamePad,
    # Conv) so the conv is index 1 (reference model.py:110-131).
    for lvl in (2, 3, 4, 5):
        out.append((f"fpn.P{lvl}_conv1", f"fpn/P{lvl}_conv1", "conv"))
        out.append((f"fpn.P{lvl}_conv2.1", f"fpn/P{lvl}_conv2", "conv"))
    # RPN (reference model.py:596-607)
    out.append(("rpn.conv_shared", "rpn/conv_shared", "conv"))
    out.append(("rpn.conv_class", "rpn/conv_class", "conv"))
    out.append(("rpn.conv_bbox", "rpn/conv_bbox", "conv"))
    # Classifier head (reference model.py:724-740)
    out.append(("classifier.conv1", "box_head/conv1", "conv"))
    out.append(("classifier.bn1", "box_head/bn1", "bn"))
    out.append(("classifier.conv2", "box_head/conv2", "conv"))
    out.append(("classifier.bn2", "box_head/bn2", "bn"))
    out.append(("classifier.linear_class", "box_head/linear_class",
                "linear"))
    out.append(("classifier.linear_bbox", "box_head/linear_bbox", "linear"))
    # Mask head (reference model.py:848-866)
    for j in range(1, 5):
        out.append((f"mask.conv{j}", f"mask_head/conv{j}", "conv"))
        out.append((f"mask.bn{j}", f"mask_head/bn{j}", "bn"))
    out.append(("mask.deconv", "mask_head/deconv", "convT"))
    out.append(("mask.conv5", "mask_head/conv5", "conv"))
    return out


_BN_FIELDS = ("weight", "bias", "running_mean", "running_var")


def _set(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get(tree: Dict, path: str) -> np.ndarray:
    node = tree
    for k in path.split("/"):
        node = node[k]
    return np.asarray(node)


def from_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                          architecture: str = "resnet101") -> Dict:
    """torch state dict (tensors or numpy arrays) -> flax params pytree.

    Missing keys raise (the reference load_weights is strict=False at
    model.py:1091 — use `strict=False` semantics by pre-filtering the
    dict if partial loads are wanted).
    """
    def arr(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    params: Dict = {}
    for tname, fpath, kind in name_map(architecture):
        if kind == "conv":
            w = arr(f"{tname}.weight").transpose(2, 3, 1, 0)
            _set(params, f"{fpath}/kernel", w)
            if f"{tname}.bias" in state_dict:
                _set(params, f"{fpath}/bias", arr(f"{tname}.bias"))
        elif kind == "convT":
            w = arr(f"{tname}.weight").transpose(2, 3, 1, 0)
            _set(params, f"{fpath}/kernel", w)
            _set(params, f"{fpath}/bias", arr(f"{tname}.bias"))
        elif kind == "linear":
            _set(params, f"{fpath}/kernel", arr(f"{tname}.weight").T)
            _set(params, f"{fpath}/bias", arr(f"{tname}.bias"))
        elif kind == "bn":
            for field in _BN_FIELDS:
                _set(params, f"{fpath}/{field}", arr(f"{tname}.{field}"))
    return params


def to_torch_state_dict(params: Dict,
                        architecture: str = "resnet101") -> Dict[str, np.ndarray]:
    """flax params pytree -> torch-layout state dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    for tname, fpath, kind in name_map(architecture):
        if kind == "conv":
            out[f"{tname}.weight"] = _get(
                params, f"{fpath}/kernel").transpose(3, 2, 0, 1)
            try:
                out[f"{tname}.bias"] = _get(params, f"{fpath}/bias")
            except KeyError:
                pass
        elif kind == "convT":
            out[f"{tname}.weight"] = _get(
                params, f"{fpath}/kernel").transpose(3, 2, 0, 1)
            out[f"{tname}.bias"] = _get(params, f"{fpath}/bias")
        elif kind == "linear":
            out[f"{tname}.weight"] = _get(params, f"{fpath}/kernel").T
            out[f"{tname}.bias"] = _get(params, f"{fpath}/bias")
        elif kind == "bn":
            for field in _BN_FIELDS:
                out[f"{tname}.{field}"] = _get(params, f"{fpath}/{field}")
    return out


def load_torch_checkpoint(path: str,
                          architecture: str = "resnet101") -> Dict:
    """Load a reference .pth file and convert (predict.py:51 equivalent)."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict(state, architecture)
