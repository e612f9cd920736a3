"""Multi-process (multi-host) data-parallel training, executed for real.

VERDICT r2 missing #3: `shard_batch`'s
`jax.make_array_from_process_local_data` branch (parallel/mesh.py) and
the BatchLoader shard_index/num_shards plumbing had never run under
`jax.process_count() > 1`. This test launches TWO actual processes
(jax.distributed.initialize on localhost, 4 virtual CPU devices each,
gloo CPU collectives), feeds per-process BatchLoader shards through
shard_batch's multi-process branch, runs one full sharded train step,
and asserts the global metrics equal a single-process 8-device run over
the identical global batch (SURVEY section 2.3 multi-slice DP).

Parametrized over the mesh topology: a flat 8-way dp mesh AND the
realistic multi-slice shape — a (dcn=2, dp=4) mesh whose leading axis
falls exactly on the process boundary (global device order is
process-major), i.e. slice == host, the deployment topology of a real
2-slice v5e pod where gradient reduction goes ICI-within-slice then
DCN-across (ROADMAP items 6-7, as far as CPU hardware can verify).

Run standalone as a child:  python tests/test_multihost.py <pid> <port>
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
DEV_PER_PROC = 4
GLOBAL_BATCH = 8


class FakeDataset:
    """Deterministic per-index samples shaped like CocoDataset.sample."""

    def __init__(self, config, n=GLOBAL_BATCH):
        self.config = config
        self.n = n

    def __len__(self):
        return self.n

    def sample(self, idx, hflip=False):
        cfg = self.config
        d = cfg.IMAGE_MAX_DIM
        g = cfg.MAX_GT_INSTANCES
        rng = np.random.RandomState(1000 + idx)
        images = rng.randint(0, 256, (d, d, 3)).astype(np.uint8)
        cls = np.zeros((g,), np.int32)
        boxes = np.zeros((g, 4), np.float32)
        valid = np.zeros((g,), bool)
        masks = np.zeros((g, d, d), np.uint8)
        for j in range(2):
            y1, x1 = rng.uniform(0, d * 0.4, 2)
            hh, ww = rng.uniform(d * 0.3, d * 0.5, 2)
            boxes[j] = [y1, x1, min(y1 + hh, d), min(x1 + ww, d)]
            cls[j] = rng.randint(1, cfg.NUM_CLASSES)
            valid[j] = True
            yb = boxes[j].astype(int)
            masks[j, yb[0]:yb[2], yb[1]:yb[3]] = 1
        return {"images": images, "gt_class_ids": cls, "gt_boxes": boxes,
                "gt_masks": masks, "gt_valid": valid}


def _one_step(config, batch, barrier=None, dcn=1):
    """One data-parallel train step; returns the metrics dict.

    `barrier(name)` (multi-process children only) rendezvouses at the
    coordinator's KV barrier — which takes no collective — at TWO
    points, because Gloo's context init inside the first collective has
    a hard 30 s peer-exchange deadline while per-process CPU work
    differs by minutes under load (model/optimizer init, jit compiles
    whenever the persistent cache misses):

    1. BEFORE the first `replicate` device_put: jax's device_put to a
       replicated multi-process sharding internally runs
       `multihost_utils.assert_equal` -> a process_allgather, i.e. the
       FIRST Gloo collective fires there, right after each process's
       own (minutes-long, contention-dependent) param init;
    2. AFTER the train step is AOT-compiled but before it executes,
       so the big-program compile gap cannot starve a (re)connect
       either.
    """
    import jax

    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.parallel import (make_mesh, make_parallel_train_step,
                                       replicate, shard_batch)
    from maskrcnn_tpu.train.step import TrainState, make_optimizer
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)

    model = MaskRCNN(config)
    params = model.init(jax.random.PRNGKey(0))
    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    optimizer = make_optimizer(config, config.LEARNING_RATE,
                               decay_mask(params, regex))
    opt_and_mask = (optimizer, lambda p, _m=tmask: _m)

    # dcn=2 is the realistic multi-slice topology: global device order is
    # process-major, so the leading (dcn) mesh axis falls exactly on the
    # process boundary — slice == host, gradients reduce intra-slice
    # first, then across. axis=None shards the batch over both axes.
    mesh = make_mesh(config.NUM_DEVICES, axis=config.MESH_AXIS_DP,
                     dcn=dcn)
    axis = None if dcn > 1 else config.MESH_AXIS_DP
    pstep = make_parallel_train_step(model, opt_and_mask, mesh, axis=axis)
    if barrier is not None:
        barrier("pre_replicate")
    state = replicate(TrainState(step=np.int32(0), params=params,
                                 opt_state=optimizer.init(params)), mesh)
    sharded = shard_batch(batch, mesh)
    key = replicate(jax.random.PRNGKey(42), mesh)
    if barrier is not None:
        pstep = pstep.lower(state, sharded, key).compile()
        barrier("compiled")
    _, metrics = pstep(state, sharded, key)
    return {k: float(v) for k, v in metrics.items()}


def _child_main(pid: int, port: int, dcn: int = 1):
    import jax
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=N_PROC, process_id=pid)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * DEV_PER_PROC

    from maskrcnn_tpu.config import TinyConfig
    from maskrcnn_tpu.data.pipeline import BatchLoader

    config = TinyConfig(NUM_DEVICES=N_PROC * DEV_PER_PROC,
                        IMAGES_PER_DEVICE=1)
    assert config.BATCH_SIZE == GLOBAL_BATCH

    # the real per-host data path: each process loads its stride of the
    # dataset; shuffle off + 1 worker => deterministic row order
    ds = FakeDataset(config)
    loader = BatchLoader(ds, GLOBAL_BATCH // N_PROC, shuffle=False,
                         num_workers=1, shard_index=pid,
                         num_shards=N_PROC, hflip=False)
    batch = next(loader)
    loader.close()
    assert batch["images"].shape[0] == GLOBAL_BATCH // N_PROC

    from jax._src import distributed

    def barrier(name):
        distributed.global_state.client.wait_at_barrier(
            f"multihost_test_{name}", timeout_in_ms=900_000)

    metrics = _one_step(config, batch, barrier=barrier, dcn=dcn)
    if pid == 0:
        with open(f"/tmp/multihost_metrics_{port}.json", "w") as f:
            json.dump(metrics, f)
    print(f"child {pid}: {metrics}")


@pytest.mark.slow
@pytest.mark.parametrize("dcn", [1, 2], ids=["dp8", "dcn2xdp4"])
def test_two_process_dp_matches_single_process(dcn):
    port = _free_port()
    out = f"/tmp/multihost_metrics_{port}.json"
    if os.path.exists(out):
        os.remove(out)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize registers the TPU plugin whenever
    # PALLAS_AXON_POOL_IPS is set — drop the trigger vars (see
    # __graft_entry__.dryrun_multichip)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_LOOPBACK_RELAY"):
        env.pop(var, None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    # Gloo's context init inside the first collective has a hard 30 s
    # peer-exchange deadline. The compile-then-barrier design in
    # _one_step makes both processes enter it within milliseconds —
    # EXCEPT when the host is so oversubscribed (parallel test suites)
    # that one child is starved of CPU for 30 s outright. That is an
    # infrastructure flake, not a product failure: retry up to 2 times,
    # but ONLY for that specific signature; real errors fail first try.
    _GLOO_FLAKE = (b"Gloo context initialization failed",
                   b"DEADLINE_EXCEEDED: GetKeyValue() timed out",
                   b"gloo/transport/tcp/pair")
    for attempt in range(3):
        logs = [open(f"/tmp/multihost_child{pid}_{port}.log", "w+b")
                for pid in range(N_PROC)]
        procs = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid),
             str(port), str(dcn)],
            env=env, cwd=REPO, stdout=logs[pid], stderr=subprocess.STDOUT)
            for pid in range(N_PROC)]
        failure = None
        try:
            for pid, p in enumerate(procs):
                rc = p.wait(timeout=1200)
                if rc != 0:
                    logs[pid].seek(0)
                    tail = logs[pid].read()
                    failure = (pid, rc, tail)
                    break
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for f in logs:
                f.close()
        if failure is None:
            break
        pid, rc, tail = failure
        flaky = any(sig in tail for sig in _GLOO_FLAKE)
        if not flaky or attempt == 2:
            raise AssertionError(
                f"multi-host child {pid} exited {rc} "
                f"(attempt {attempt + 1}):\n"
                + tail.decode(errors="replace")[-4000:])
        port = _free_port()  # fresh coordinator for the retry
        out = f"/tmp/multihost_metrics_{port}.json"
    with open(out) as f:
        multi = json.load(f)

    # single-process oracle over the identical global batch: device order
    # is process-major, so global rows = proc0's stride then proc1's
    from maskrcnn_tpu.config import TinyConfig
    from maskrcnn_tpu.ops.bits import pack_masks

    config = TinyConfig(NUM_DEVICES=N_PROC * DEV_PER_PROC,
                        IMAGES_PER_DEVICE=1)
    ds = FakeDataset(config)
    order = [i for pid in range(N_PROC)
             for i in range(pid, GLOBAL_BATCH, N_PROC)]
    samples = [ds.sample(i) for i in order]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    batch["gt_masks_packed"] = pack_masks(batch.pop("gt_masks"))
    single = _one_step(config, batch)

    assert set(multi) == set(single)
    for k in single:
        np.testing.assert_allclose(
            multi[k], single[k], rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k}: 2-process {multi[k]} vs "
                    f"single-process {single[k]}")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


if __name__ == "__main__":
    _child_main(int(sys.argv[1]), int(sys.argv[2]),
                int(sys.argv[3]) if len(sys.argv) > 3 else 1)
