#!/usr/bin/env python
"""Training throughput benchmark: train-step images/sec/chip at 1024px.

    python benchmarks/train_bench.py [batch] [remat:0|1] [mom_dtype] [remat_heads:0|1]

The reference trains 1 image/step on an 8GB GPU (config.py:183-185) with
host-side target sampling; this measures the full jitted step — on-device
RPN+RoI target sampling, 5-loss forward, backward, SGD update — via
cached dispatches with a scalar fetch (see bench.py for tunnel caveats).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main(batch: int = 4, remat: bool = True, mom_dtype: str = "float32",
         remat_heads: bool = False, accum: int = 1, canvas: int = 0):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maskrcnn_tpu.config import CocoConfig
    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.ops.bits import pack_masks
    from maskrcnn_tpu.train.step import (TrainState, make_optimizer,
                                         train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)

    over = {}
    if canvas:  # curriculum-stage shapes (see trainer.fit_canvas_curriculum)
        over = dict(IMAGE_CANVAS=(canvas, canvas), IMAGE_MAX_DIM=canvas,
                    IMAGE_MIN_DIM=round(800 * canvas / 1024))
    config = CocoConfig(REMAT_BACKBONE=remat, OPT_MOMENTUM_DTYPE=mom_dtype,
                        REMAT_HEADS=remat_heads, GRAD_ACCUM_STEPS=accum,
                        **over)
    model = MaskRCNN(config)
    params = model.init(jax.random.PRNGKey(0))

    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    optimizer = make_optimizer(config, config.LEARNING_RATE,
                               decay_mask(params, regex))
    opt_and_mask = (optimizer, lambda p, _m=tmask: _m)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=optimizer.init(params))

    raw = next(SyntheticLoader(config, batch))
    raw["gt_masks_packed"] = pack_masks(raw.pop("gt_masks"))
    if accum > 1:
        from maskrcnn_tpu.train.step import split_accum
        raw = split_accum(raw, accum)
    batch_dev = jax.device_put(raw)
    key = jax.random.PRNGKey(1)

    iters = 4

    # K steps inside one jit (carrying the TrainState) — the dev tunnel's
    # ~30ms dispatch latency would otherwise dominate a per-step timing.
    @jax.jit
    def loop(state, batch, key):
        def body(i, carry):
            st, _ = carry
            st2, metrics = train_step(model, opt_and_mask, st, batch,
                                      jax.random.fold_in(key, i))
            return st2, metrics["total"]

        return jax.lax.fori_loop(0, iters, body,
                                 (state, jnp.float32(0.0)))

    t0 = time.time()
    state, loss = loop(state, batch_dev, key)
    loss = float(loss)
    print(f"compile+first {iters} steps: {time.time() - t0:.0f}s "
          f"loss={loss:.3f}", file=sys.stderr)
    assert np.isfinite(loss)

    t0 = time.time()
    state, loss = loop(state, batch_dev, key)
    float(loss)
    dt = (time.time() - t0) / iters
    print(f"batch {batch} remat={remat} mom={mom_dtype} rheads={remat_heads} accum={accum}: {dt:.3f}s/step -> "
          f"{batch / dt:.2f} img/s ({1e3 * dt / batch:.1f} ms/img)")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    m = sys.argv[3] if len(sys.argv) > 3 else "float32"
    rh = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    ac = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    cv = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    main(b, r, m, rh, ac, cv)
