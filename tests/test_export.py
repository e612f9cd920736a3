"""AOT export artifact: serialize, reload, run without model code.

Proves the three deployment-relevant properties:
1. round-trip fidelity — the deserialized program's outputs are
   bit-identical to the live jitted pipeline's on the same inputs;
2. self-containedness — a clean subprocess that imports ONLY jax/numpy
   (maskrcnn_tpu is blocked from sys.modules) loads the artifact + the
   .npz weight sidecar and reproduces the same detections;
3. the weight sidecar codec round-trips the param pytree exactly.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu import export as ex
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.detection.pipeline import predict_step
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN


def _tiny():
    cfg = TinyConfig(COMPUTE_DTYPE="float32")
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def _inputs(cfg, b=2, seed=1):
    h, w = cfg.IMAGE_SHAPE[:2]
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (b, h, w, 3), np.uint8)
    windows = np.tile([[0.0, 0.0, float(h), float(w)]], (b, 1)).astype(
        np.float32)
    return jnp.asarray(images), jnp.asarray(windows)


def test_roundtrip_bit_identical(tmp_path):
    cfg, model, params = _tiny()
    images, windows = _inputs(cfg)

    blob = ex.export_predict(model, params, batch_size=2)
    call = ex.load_exported(blob)

    want = predict_step(model, params, images, windows)
    got = call(params, images, windows)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_params_npz_roundtrip(tmp_path):
    _, _, params = _tiny()
    path = str(tmp_path / "w.npz")
    ex.params_to_npz(params, path)
    back = ex.params_from_npz(path)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params,
                           jax.tree_util.tree_map(np.asarray, back))


_RUNNER = r"""
import pickle, sys
# deployment runtime: only jax + numpy; model code must not be needed
sys.modules["maskrcnn_tpu"] = None  # any import attempt -> error
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jax_export

artifact, weights, inputs, out_path = sys.argv[1:5]
exp = jax_export.deserialize(open(artifact, "rb").read())

def params_from_npz(path):
    out = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out

params = params_from_npz(weights)
with open(inputs, "rb") as f:
    images, windows = pickle.load(f)
out = exp.call(params, images, windows)
host = {k: np.asarray(v) for k, v in out.items()}
with open(out_path, "wb") as f:
    pickle.dump(host, f)
"""


def test_runs_without_model_code(tmp_path):
    cfg, model, params = _tiny()
    images, windows = _inputs(cfg)

    artifact = str(tmp_path / "pipeline.shlo")
    ex.save_exported(model, params, 2, artifact, platforms=("cpu",))
    weights = ex.params_to_npz(params, str(tmp_path / "w.npz"))
    inputs = str(tmp_path / "in.pkl")
    with open(inputs, "wb") as f:
        pickle.dump((np.asarray(images), np.asarray(windows)), f)
    runner = str(tmp_path / "runner.py")
    with open(runner, "w") as f:
        f.write(_RUNNER)
    out_path = str(tmp_path / "out.pkl")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("AXON_LOOPBACK_RELAY", None)
    subprocess.run([sys.executable, runner, artifact, weights, inputs,
                    out_path], check=True, env=env, timeout=600)

    with open(out_path, "rb") as f:
        got = pickle.load(f)
    want = predict_step(model, params, images, windows)
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]),
                                      err_msg=k)


def test_sharded_export_roundtrip():
    """Multi-chip serving artifact: the dp-sharded predict exports with
    its sharding annotations + collectives and re-runs bit-identically
    from deserialize on the 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, model, params = _tiny()
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))

    blob = ex.export_predict(model, params, batch_size=8, mesh=mesh)
    call = ex.load_exported(blob)

    images, windows = _inputs(cfg, b=8)
    images = jax.device_put(images, shard)
    windows = jax.device_put(windows, shard)
    params_r = jax.device_put(params, repl)

    want = jax.jit(
        lambda p, im, w: predict_step(model, p, im, w),
        in_shardings=(repl, shard, shard), out_shardings=shard)(
            params_r, images, windows)
    got = call(params_r, images, windows)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
