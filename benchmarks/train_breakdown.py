#!/usr/bin/env python
"""Per-phase device-time breakdown of the training step.

Times progressively larger slices of the work — loss forward only,
gradients w.r.t. the heads only (backbone backward elided), full
gradients, full step with optimizer + non-finite guard — each as an
in-graph fori_loop (see bench.py for why per-dispatch timing is
meaningless through the dev tunnel). Consecutive differences attribute
device time to forward, head backward, backbone backward (incl. the
remat recompute), and optimizer.

    python benchmarks/train_breakdown.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch: int = 16, iters: int = 4):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maskrcnn_tpu.config import CocoConfig
    from maskrcnn_tpu.data.pipeline import SyntheticLoader
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
    from maskrcnn_tpu.ops.bits import pack_masks
    from maskrcnn_tpu.train.step import (TrainState, compute_losses,
                                         make_optimizer, train_step)
    from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                            trainable_mask)

    config = CocoConfig()
    model = MaskRCNN(config)
    params = model.init(jax.random.PRNGKey(0))

    raw = next(SyntheticLoader(config, batch))
    raw["gt_masks_packed"] = pack_masks(raw.pop("gt_masks"))
    batch_dev = jax.device_put(raw)
    key = jax.random.PRNGKey(1)

    def timed(label, fn, *args):
        loop_fn = jax.jit(lambda *a: jax.lax.fori_loop(
            0, iters, lambda i, acc: acc + fn(
                *a, jax.random.fold_in(key, i)), jnp.float32(0.0)))
        float(loop_fn(*args))  # compile + warm
        t0 = time.perf_counter()
        float(loop_fn(*args))
        dt = time.perf_counter() - t0
        ms = 1e3 * dt / (batch * iters)
        print(f"{label:24s} {ms:8.2f} ms/img", flush=True)
        return ms

    def loss_only(p, b, k):
        return compute_losses(model, p, k, b).total

    def grad_of(layers):
        regex = LAYER_REGEX[layers]
        tmask = trainable_mask(params, regex)

        def fn(p, b, k):
            def lfn(pp):
                return compute_losses(model, pp, k, b).total

            grads = jax.grad(lfn)(p)
            # masked like the production step: frozen grads are zeroed,
            # so XLA can DCE the corresponding backward slices
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.where(m, g, 0.0), grads, tmask)
            return sum(jnp.sum(jnp.abs(g).astype(jnp.float32) * 1e-9)
                       for g in jax.tree_util.tree_leaves(grads))

        return fn

    t_fwd = timed("forward (5 losses)", loss_only, params, batch_dev)
    t_heads = timed("grad: heads only", grad_of("heads"), params,
                    batch_dev)
    t_all = timed("grad: all layers", grad_of("all"), params, batch_dev)

    regex = LAYER_REGEX["all"]
    tmask = trainable_mask(params, regex)
    optimizer = make_optimizer(config, config.LEARNING_RATE,
                               decay_mask(params, regex))
    opt_and_mask = (optimizer, lambda p, _m=tmask: _m)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=optimizer.init(params))

    # the real step carries state through the loop so the optimizer
    # update stays alive — timed the way train_bench does
    @jax.jit
    def step_loop(st, b):
        def body(i, carry):
            st2, metrics = train_step(model, opt_and_mask, carry[0], b,
                                      jax.random.fold_in(key, i))
            return st2, metrics["total"]
        return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0.0)))

    st, v = step_loop(state, batch_dev)
    float(v)
    t0 = time.perf_counter()
    st, v = step_loop(state, batch_dev)
    float(v)
    dt = time.perf_counter() - t0
    t_step = 1e3 * dt / (batch * iters)
    print(f"{'full train_step':24s} {t_step:8.2f} ms/img", flush=True)

    print()
    print(f"forward                 {t_fwd:8.2f}")
    print(f"head backward           {t_heads - t_fwd:8.2f}")
    print(f"backbone bwd (+remat)   {t_all - t_heads:8.2f}")
    print(f"optimizer + guard       {t_step - t_all:8.2f}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(b, it)
