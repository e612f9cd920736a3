"""AOT export of the detection pipeline as a serialized StableHLO artifact.

Production serving often cannot ship Python model code: deployments want
a compiled, versioned artifact that a slim runtime loads and runs.
`jax.export` gives exactly that for a jitted function — the traced
pipeline is serialized as StableHLO with a stable calling convention,
and `deserialize(...).call` re-runs it with NO maskrcnn_tpu imports
(tests/test_export.py proves it from a clean subprocess that imports
only jax).

The artifact contains the PROGRAM, not the weights: `export_predict`
exports `fn(params, images, windows)` so the blob stays small (StableHLO
text, ~MBs) and weights keep flowing through the existing checkpoint
stores (orbax / converted .pth). Pass `platforms=("tpu", "cpu")` to emit
one artifact that runs on both.

The reference has no analog — its deployment story is importing model.py
and loading the .pth (reference model.py:1489-1538). This is TPU-native
framework surface: the exported program embeds the same XLA graph the
live pipeline jits, including the int8-PTQ variant (quantized params are
ordinary arrays, so a `prepare_quant_params` tree exports unchanged).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def _predict_fn(model):
    from maskrcnn_tpu.detection.pipeline import predict_step

    def fn(params, images, windows):
        return predict_step(model, params, images, windows)

    return fn


def export_predict(model, params, batch_size: int,
                   platforms: Optional[Sequence[str]] = None,
                   mesh=None, dp_axis: str = "dp") -> bytes:
    """Serialize the end-to-end predict pipeline for `batch_size`.

    model: MaskRCNN (its config fixes the canvas / precision / quant
        mode — the artifact is specialized to all of them, like any AOT
        compile).
    params: parameter pytree — used only for shapes/dtypes; the values
        do NOT enter the artifact.
    platforms: lowering platforms, e.g. ("tpu",) or ("tpu", "cpu").
        Default: the current default backend.
    mesh: optional jax.sharding.Mesh — exports the MULTI-CHIP serving
        program instead (params replicated, batch sharded on `dp_axis`;
        the sharding annotations and collectives serialize with the
        program, and `deserialize(...).call` re-runs it on any mesh of
        the same device count; tests/test_export.py round-trips it on
        the 8-device CPU mesh bit-identically). `batch_size` is global.
    Returns the serialized artifact bytes.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    h, w = model.config.IMAGE_SHAPE[:2]
    if mesh is not None:
        repl = NamedSharding(mesh, PartitionSpec())
        shard = NamedSharding(mesh, PartitionSpec(dp_axis))
    else:
        repl = shard = None

    def spec(shape, dtype, s):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=s)

    p_spec = jax.tree_util.tree_map(
        lambda a: spec(jnp.shape(a), jnp.asarray(a).dtype, repl), params)
    im_spec = spec((batch_size, h, w, 3), jnp.uint8, shard)
    win_spec = spec((batch_size, 4), jnp.float32, shard)

    if mesh is not None:
        fn = jax.jit(_predict_fn(model),
                     in_shardings=(repl, shard, shard),
                     out_shardings=shard)
    else:
        fn = jax.jit(_predict_fn(model))
    exp = jax_export.export(
        fn, platforms=tuple(platforms) if platforms else None)(
            p_spec, im_spec, win_spec)
    return exp.serialize()


def save_exported(model, params, batch_size: int, path: str,
                  platforms: Optional[Sequence[str]] = None) -> str:
    with open(path, "wb") as f:
        f.write(export_predict(model, params, batch_size, platforms))
    return path


def load_exported(path_or_bytes):
    """Deserialize an artifact -> callable(params, images, windows).

    Needs only jax (plus the weights pytree) — no model code. The
    callable jit-compiles on first use for the local backend (which must
    be one of the platforms the artifact was exported for).
    """
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exp = jax_export.deserialize(blob)

    @functools.wraps(exp.call)
    def call(params, images, windows):
        return exp.call(params, images, windows)

    call.in_avals = exp.in_avals
    call.platforms = exp.platforms
    return call


def params_to_npz(params, path: str) -> str:
    """Flatten a param pytree into an .npz keyed by '/'-joined paths —
    the weight sidecar for a no-model-code runtime (tests reconstruct
    the pytree from the keys alone)."""
    flat = {}

    def walk(tree, prefix):
        for k in sorted(tree):
            v = tree[k]
            if isinstance(v, dict):
                walk(v, prefix + (str(k),))
            else:
                flat["/".join(prefix + (str(k),))] = np.asarray(v)

    walk(params, ())
    np.savez(path, **flat)
    return path


def params_from_npz(path: str) -> dict:
    """Inverse of params_to_npz."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out
