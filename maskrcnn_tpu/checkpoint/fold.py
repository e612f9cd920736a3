"""Fold frozen BatchNorm into the adjacent conv's kernel/bias.

The reference freezes every BN at build time and keeps them in eval mode
forever (reference: model.py:1010-1016, 1218-1223), so BN is a constant
per-channel affine: y = conv(x) * s + o with s = w/sqrt(var+eps),
o = b - mean*s. Folding gives kernel' = kernel * s (output channel),
bias' = bias * s + o, after which the model runs with FOLD_BN=True and
skips the affine entirely. Inference-only: folding rescales the kernel,
which changes SGD's effective per-layer step size — never train folded.

The BN entries are reset to an exact identity (weight=1, bias=0, mean=0,
var=1-eps) so the same folded tree also evaluates correctly with
FOLD_BN=False, and the param-tree structure stays checkpoint-identical.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.models.resnet import BN_EPS

# conv module name -> its BN partner within the same parent dict.
_SPECIAL = {"downsample_conv": "downsample_bn", "C1_conv": "C1_bn"}


def _bn_partner(name: str):
    if name in _SPECIAL:
        return _SPECIAL[name]
    if name.startswith("conv") and name[4:].isdigit():
        return "bn" + name[4:]
    return None


def _is_conv(v) -> bool:
    return isinstance(v, dict) and "kernel" in v and "bias" in v


def _is_bn(v) -> bool:
    return isinstance(v, dict) and "running_mean" in v


def fold_bn_params(params: Dict, eps: float = BN_EPS) -> Dict:
    """New param tree with every conv->BN pair folded (pure; inputs
    unmodified). Works on numpy or jax leaves."""

    def walk(d):
        if not isinstance(d, dict):
            return d
        out = {k: walk(v) for k, v in d.items()}
        for name, conv in list(out.items()):
            bn_name = _bn_partner(name)
            if bn_name is None or bn_name not in out:
                continue
            bn = out[bn_name]
            if not (_is_conv(conv) and _is_bn(bn)):
                continue
            scale = bn["weight"] / jnp.sqrt(bn["running_var"] + eps)
            offset = bn["bias"] - bn["running_mean"] * scale
            out[name] = dict(conv)
            out[name]["kernel"] = conv["kernel"] * scale  # [..., O] * [O]
            out[name]["bias"] = conv["bias"] * scale + offset
            f = np.asarray(bn["weight"]).shape
            out[bn_name] = {
                "weight": jnp.ones(f, jnp.float32),
                "bias": jnp.zeros(f, jnp.float32),
                "running_mean": jnp.zeros(f, jnp.float32),
                "running_var": jnp.full(f, 1.0 - eps, jnp.float32),
            }
        return out

    return walk(params)
