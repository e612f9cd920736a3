"""Train-step tests: freezing, learning, and data-parallel equivalence.

DP correctness is checked on the 8-virtual-device CPU mesh: one fused
step over a sharded batch must match the single-device step on the same
batch (same RNG), proving the psum/all-reduce insertion is semantically
transparent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   replicate, shard_batch)
from maskrcnn_tpu.train.step import TrainState, make_optimizer, train_step
from maskrcnn_tpu.train.trainer import (LAYER_REGEX, decay_mask,
                                        param_paths, trainable_mask)
from tests.test_targets import make_gt


def make_batch(cfg, rng, b):
    d = cfg.IMAGE_MAX_DIM
    g = cfg.MAX_GT_INSTANCES
    images = (rng.rand(b, d, d, 3) * 255).astype(np.uint8)
    cls = np.zeros((b, g), np.int32)
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    masks = np.zeros((b, g, d, d), np.uint8)
    for i in range(b):
        c, bx, v = make_gt(cfg, rng, 3)
        cls[i], boxes[i], valid[i] = c, bx, v
        for j in range(3):
            y1, x1, y2, x2 = bx[j].astype(int)
            masks[i, j, y1:y2, x1:x2] = 1
    return {"images": images, "gt_class_ids": cls, "gt_boxes": boxes,
            "gt_masks": masks, "gt_valid": valid}


@pytest.fixture(scope="module")
def setup():
    cfg = TinyConfig()
    model = MaskRCNN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def _opt(cfg, params, layers="all", lr=0.001):
    regex = LAYER_REGEX[layers]
    tmask = trainable_mask(params, regex)
    opt = make_optimizer(cfg, lr, decay_mask(params, regex))
    return (opt, lambda p, _m=tmask: _m), opt


def test_freezing_heads_only(setup, rng):
    cfg, model, params = setup
    batch = make_batch(cfg, rng, 1)
    opt_and_mask, opt = _opt(cfg, params, layers="heads")
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    new_state, metrics = train_step(model, opt_and_mask, state, batch,
                                    jax.random.PRNGKey(1))
    flat_old = dict(zip(param_paths(params),
                        jax.tree_util.tree_leaves(params)))
    flat_new = dict(zip(param_paths(new_state.params),
                        jax.tree_util.tree_leaves(new_state.params)))
    changed_backbone = [
        p for p in flat_old
        if p.startswith("fpn/resnet")
        and not np.allclose(flat_old[p], flat_new[p])
    ]
    assert not changed_backbone, changed_backbone[:5]
    # BN params never move, even under 'all'
    opt_and_mask, opt = _opt(cfg, params, layers="all")
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    new_state, _ = train_step(model, opt_and_mask, state, batch,
                              jax.random.PRNGKey(1))
    flat_new = dict(zip(param_paths(new_state.params),
                        jax.tree_util.tree_leaves(new_state.params)))
    for p in flat_old:
        if "bn" in p.lower():
            assert np.allclose(flat_old[p], flat_new[p]), p
        elif p.endswith("kernel"):
            pass  # most kernels should move; spot-check below
    moved = [p for p in flat_old
             if "bn" not in p.lower()
             and not np.allclose(flat_old[p], flat_new[p])]
    assert len(moved) > 50


@pytest.mark.slow
def test_loss_decreases(setup, rng):
    cfg, model, params = setup
    batch = make_batch(cfg, rng, 1)
    opt_and_mask, opt = _opt(cfg, params, layers="all", lr=0.002)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    first = None
    key = jax.random.PRNGKey(42)
    for i in range(6):
        # fixed RNG -> fixed sampled targets, loss must go down
        state, metrics = train_step(model, opt_and_mask, state, batch, key)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_parallel_step_matches_single_device(setup, rng):
    cfg, model, params = setup
    b = 8
    batch = make_batch(cfg, rng, b)
    key = jax.random.PRNGKey(7)

    opt_and_mask, opt = _opt(cfg, params, layers="heads")
    state0 = TrainState(step=jnp.int32(0), params=params,
                        opt_state=opt.init(params))
    single_state, single_metrics = train_step(model, opt_and_mask, state0,
                                              batch, key)

    mesh = make_mesh(8)
    pstep = make_parallel_train_step(model, opt_and_mask, mesh)
    state_r = replicate(
        TrainState(step=jnp.int32(0), params=params,
                   opt_state=opt.init(params)), mesh)
    batch_s = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                          mesh)
    par_state, par_metrics = pstep(state_r, batch_s, replicate(key, mesh))

    np.testing.assert_allclose(float(single_metrics["total"]),
                               float(par_metrics["total"]), rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(single_state.params),
                     jax.tree_util.tree_leaves(par_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_parallel_predict_on_mesh(setup, rng):
    """Batch-sharded inference over the 8-device CPU mesh."""
    import numpy as np
    from maskrcnn_tpu.parallel import make_mesh, make_parallel_predict

    cfg, model, params = setup
    mesh = make_mesh(8)
    run = make_parallel_predict(model, mesh)
    d = cfg.IMAGE_MAX_DIM
    images = jnp.asarray((rng.rand(8, d, d, 3) * 255).astype(np.uint8))
    windows = jnp.asarray(np.tile([[0, 0, d, d]], (8, 1)).astype(np.float32))
    out = run(replicate(params, mesh),
              jax.device_put(images,
                             jax.sharding.NamedSharding(
                                 mesh, jax.sharding.PartitionSpec("dp"))),
              jax.device_put(windows,
                             jax.sharding.NamedSharding(
                                 mesh, jax.sharding.PartitionSpec("dp"))))
    assert out["boxes"].shape == (8, cfg.DETECTION_MAX_INSTANCES, 4)
    # sharded output must equal single-device predict
    from maskrcnn_tpu.detection.pipeline import predict_step
    ref = predict_step(model, params, images, windows)
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-5)


@pytest.mark.slow
def test_two_axis_mesh_step_matches_single_device(setup, rng):
    """(dcn=2, dp=4) cross-slice topology: numeric parity with the
    single-device step, and the lowered program really contains the
    gradient all-reduce collective over all 8 devices (SURVEY section
    2.3 multi-slice DP; roadmap item: verify the dcn-axis reduce)."""
    cfg, model, params = setup
    b = 8
    batch = make_batch(cfg, rng, b)
    key = jax.random.PRNGKey(7)

    opt_and_mask, opt = _opt(cfg, params, layers="heads")
    state0 = TrainState(step=jnp.int32(0), params=params,
                        opt_state=opt.init(params))
    single_state, single_metrics = train_step(model, opt_and_mask, state0,
                                              batch, key)

    mesh = make_mesh(8, dcn=2)
    assert mesh.devices.shape == (2, 4)
    pstep = make_parallel_train_step(model, opt_and_mask, mesh)
    state_r = replicate(
        TrainState(step=jnp.int32(0), params=params,
                   opt_state=opt.init(params)), mesh)
    batch_s = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                          mesh)
    # every batch leaf shards over the dcn x dp product (8 ways)
    for v in batch_s.values():
        assert len(v.sharding.device_set) == 8
        assert v.addressable_shards[0].data.shape[0] == b // 8

    compiled = pstep.lower(state_r, batch_s,
                           replicate(key, mesh)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in lowered HLO"
    # collective budget: pure DP must lower to a handful of FUSED grad
    # all-reduces — a blowup here means a sharding annotation regressed
    # into per-parameter reduces; and a replicated-params/sharded-batch
    # program has no business emitting all-to-alls or permutes (those
    # would be XLA resharding behind our back).
    import re
    n_ar = len(re.findall(r"= \S+ all-reduce(?:-start)?\(", hlo))
    assert 1 <= n_ar <= 16, f"{n_ar} all-reduce ops in the DP step"
    assert "all-to-all" not in hlo, "unexpected all-to-all in DP step"
    # SPMD partitioning legitimately emits TINY integer
    # collective-permutes for sharded RNG/slice bookkeeping (u32[2,2]
    # etc.); what must never appear is a permute of real activation/
    # gradient tensors — that would be XLA resharding our data behind
    # the annotations.
    for dtype, dims in re.findall(
            r"= (\w+)\[([0-9,]*)\][^ ]* collective-permute", hlo):
        elems = np.prod([int(d) for d in dims.split(",") if d] or [1])
        assert dtype in ("u32", "s32", "u64", "s64") and elems <= 64, \
            f"data-sized collective-permute in DP step: {dtype}[{dims}]"

    par_state, par_metrics = pstep(state_r, batch_s, replicate(key, mesh))
    np.testing.assert_allclose(float(single_metrics["total"]),
                               float(par_metrics["total"]), rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(single_state.params),
                     jax.tree_util.tree_leaves(par_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_remat_heads_identical_grads(setup, rng):
    """REMAT_HEADS changes the backward-pass schedule (head internals
    recomputed, not saved), never the math: losses and gradients must be
    bit-identical to the non-remat step."""
    cfg, model, params = setup
    from maskrcnn_tpu.train.step import compute_losses
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, rng, 2).items()}
    key = jax.random.PRNGKey(3)

    def grads_for(config):
        m = MaskRCNN(config)

        def loss_fn(p):
            losses = compute_losses(m, p, key, batch)
            return losses.total, losses

        return jax.jit(jax.grad(loss_fn, has_aux=True))(params)

    g0, l0 = grads_for(cfg)
    g1, l1 = grads_for(cfg.replace(REMAT_HEADS=True))
    np.testing.assert_array_equal(float(l0.total), float(l1.total))
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.slow
def test_grad_accum_matches_manual_average(setup, rng):
    """GRAD_ACCUM_STEPS=2: the fused accumulate-then-update step equals
    averaging the two micro-batch gradients by hand (same split keys)
    and applying one optimizer update."""
    from maskrcnn_tpu.train.step import compute_losses, split_accum

    cfg, model, params = setup
    acfg = cfg.replace(GRAD_ACCUM_STEPS=2)
    amodel = MaskRCNN(acfg)
    b = 8
    batch = make_batch(cfg, rng, b)
    key = jax.random.PRNGKey(11)

    opt_and_mask, opt = _opt(acfg, params, layers="heads")
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=opt.init(params))
    stacked = {k: jnp.asarray(v)
               for k, v in split_accum(batch, 2).items()}
    astate, ametrics = train_step(amodel, opt_and_mask, state, stacked,
                                  key)

    # manual average with the same per-micro keys
    def loss_fn(p, k, mb):
        losses = compute_losses(model, p, k, mb)
        return losses.total, losses

    keys = jax.random.split(key, 2)
    gl = [jax.grad(loss_fn, has_aux=True)(
        params, keys[j], {k: v[j] for k, v in stacked.items()})
        for j in range(2)]
    grads = jax.tree_util.tree_map(lambda a, c: (a + c) / 2.0,
                                   gl[0][0], gl[1][0])
    total_manual = (float(gl[0][1].total) + float(gl[1][1].total)) / 2.0
    np.testing.assert_allclose(float(ametrics["total"]), total_manual,
                               rtol=1e-5)

    optimizer, trainable_fn = opt_and_mask
    trainable = trainable_fn(params)
    grads = jax.tree_util.tree_map(
        lambda g, t: g * jnp.asarray(t, g.dtype), grads, trainable)
    updates, _ = optimizer.update(grads, opt.init(params), params)
    import optax
    manual_params = optax.apply_updates(params, updates)
    for a, m in zip(jax.tree_util.tree_leaves(astate.params),
                    jax.tree_util.tree_leaves(manual_params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(m, np.float32),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_grad_accum_on_mesh_matches_single_device(setup, rng):
    """accum=2 composed with the dp mesh: micro-stacked batch sharded on
    its SECOND axis, metrics equal the single-device accum step."""
    from maskrcnn_tpu.train.step import split_accum

    cfg, model, params = setup
    acfg = cfg.replace(GRAD_ACCUM_STEPS=2)
    amodel = MaskRCNN(acfg)
    b = 16
    batch = make_batch(cfg, rng, b)
    key = jax.random.PRNGKey(13)

    opt_and_mask, opt = _opt(acfg, params, layers="heads")
    state0 = TrainState(step=jnp.int32(0), params=params,
                        opt_state=opt.init(params))
    stacked = {k: jnp.asarray(v)
               for k, v in split_accum(batch, 2).items()}
    single_state, single_metrics = train_step(amodel, opt_and_mask,
                                              state0, stacked, key)

    mesh = make_mesh(8)
    pstep = make_parallel_train_step(amodel, opt_and_mask, mesh)
    state_r = replicate(
        TrainState(step=jnp.int32(0), params=params,
                   opt_state=opt.init(params)), mesh)
    batch_s = shard_batch(split_accum(batch, 2), mesh,
                          leading_accum=True)
    for v in batch_s.values():
        assert v.shape[0] == 2
        assert v.addressable_shards[0].data.shape[1] == (b // 2) // 8
    par_state, par_metrics = pstep(state_r, batch_s,
                                   replicate(key, mesh))
    np.testing.assert_allclose(float(single_metrics["total"]),
                               float(par_metrics["total"]), rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(single_state.params),
                     jax.tree_util.tree_leaves(par_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)
