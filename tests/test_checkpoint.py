"""Checkpoint tests: torch round-trip, layer-level numeric equivalence
with torch ops, and orbax save/load/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from maskrcnn_tpu.checkpoint.store import (latest_epoch, load_checkpoint,
                                           save_checkpoint)
from maskrcnn_tpu.checkpoint.torch_convert import (from_torch_state_dict,
                                                   name_map,
                                                   to_torch_state_dict)
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN


@pytest.fixture(scope="module")
def model_params():
    model = MaskRCNN(TinyConfig())
    return model, model.init(jax.random.PRNGKey(0))


def test_roundtrip_torch(model_params):
    model, params = model_params
    sd = to_torch_state_dict(params, model.config.BACKBONE)
    back = from_torch_state_dict(sd, model.config.BACKBONE)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_name_map_covers_tree(model_params):
    """Every flax param must be produced by the converter (no orphans)."""
    model, params = model_params
    converted = from_torch_state_dict(
        to_torch_state_dict(params, model.config.BACKBONE),
        model.config.BACKBONE)
    a = jax.tree_util.tree_structure(params)
    b = jax.tree_util.tree_structure(converted)
    assert a == b


def test_conv_layer_numeric_equivalence(rng):
    """torch Conv2d(pad=1) == flax Conv with converted weights."""
    import flax.linen as nn
    x = rng.randn(1, 3, 9, 9).astype(np.float32)
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    with torch.no_grad():
        want = tconv(torch.tensor(x)).numpy()
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = tconv.bias.detach().numpy()
    fconv = nn.Conv(5, (3, 3), padding=((1, 1), (1, 1)))
    got = fconv.apply({"params": {"kernel": kernel, "bias": bias}},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_convtranspose_numeric_equivalence(rng):
    """torch ConvTranspose2d(2,2 stride 2) == flax ConvTranspose with the
    (2,3,0,1) transposed kernel (the mask head deconv, model.py:864)."""
    import flax.linen as nn
    x = rng.randn(1, 4, 7, 7).astype(np.float32)
    tdeconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    with torch.no_grad():
        want = tdeconv(torch.tensor(x)).numpy()
    kernel = tdeconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = tdeconv.bias.detach().numpy()
    fdeconv = nn.ConvTranspose(6, (2, 2), strides=(2, 2),
                               transpose_kernel=True)
    got = fdeconv.apply({"params": {"kernel": kernel, "bias": bias}},
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_frozen_bn_numeric_equivalence(rng):
    """torch BatchNorm2d.eval() == FrozenBatchNorm (eps=0.001)."""
    from maskrcnn_tpu.models.resnet import FrozenBatchNorm
    x = rng.randn(1, 8, 4, 4).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(8, eps=0.001)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.rand(8).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.rand(8).astype(np.float32)))
        tbn.running_mean.copy_(
            torch.tensor(rng.randn(8).astype(np.float32)))
        tbn.running_var.copy_(
            torch.tensor(rng.rand(8).astype(np.float32) + 0.5))
    tbn.eval()
    with torch.no_grad():
        want = tbn(torch.tensor(x)).numpy()
    params = {
        "weight": tbn.weight.detach().numpy(),
        "bias": tbn.bias.detach().numpy(),
        "running_mean": tbn.running_mean.numpy(),
        "running_var": tbn.running_var.numpy(),
    }
    got = FrozenBatchNorm(8).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_stem_pooling_matches_torch(rng):
    """SamePad(3,2)+MaxPool(3,2) == flax max_pool with (0,1) padding.

    The reference zero-pads (SamePad2d, model.py:87) while flax pads with
    -inf; identical because the stem input is post-ReLU (>= 0).
    """
    import flax.linen as nn
    x = np.maximum(rng.randn(1, 1, 16, 16), 0.0).astype(np.float32)
    tx = torch.tensor(x)
    tpad = F.pad(tx, (0, 1, 0, 1), value=0.0)  # SamePad pads (0,1) zeros
    want = F.max_pool2d(tpad, 3, 2).numpy()
    got = nn.max_pool(jnp.asarray(x.transpose(0, 2, 3, 1)), (3, 3),
                      strides=(2, 2), padding=((0, 1), (0, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5)


def test_orbax_save_load_resume(model_params, tmp_path):
    model, params = model_params
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir, params, 3)
    save_checkpoint(run_dir, params, 7)
    assert latest_epoch(run_dir) == 7
    loaded, epoch = load_checkpoint(run_dir, params)
    assert epoch == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_overlaps_and_roundtrips(model_params, tmp_path):
    """block=False returns before the write finishes; after
    wait_for_saves the checkpoint loads bit-exact, even though the live
    params were mutated (donated-buffer style) right after save()."""
    import jax.numpy as jnp

    from maskrcnn_tpu.checkpoint.store import wait_for_saves

    model, params = model_params
    run_dir = str(tmp_path / "run")
    snapshot = jax.device_get(params)
    save_checkpoint(run_dir, params, 1, block=False)
    # mutate the live tree immediately — orbax must have snapshotted
    mutated = jax.tree_util.tree_map(lambda p: jnp.asarray(p) + 1.0,
                                     params)
    del params
    wait_for_saves()
    assert latest_epoch(run_dir) == 1
    loaded, _ = load_checkpoint(run_dir, mutated)
    for a, b in zip(jax.tree_util.tree_leaves(snapshot),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reinit_mismatched_heads(model_params, tmp_path):
    """Fine-tune flow: load an 81-class checkpoint into a 4-class model.

    Only the class-dependent leaves (box_head linear_class/linear_bbox,
    mask_head conv5) reinitialize; everything else transfers bit-exact.
    Covers both checkpoint formats (orbax dir and .pth) and the default
    strict behavior (docs/CUSTOM_DATASET.md workflow).
    """
    from maskrcnn_tpu.checkpoint.store import load_params

    model81, params81 = model_params
    run_dir = str(tmp_path / "run81")
    save_checkpoint(run_dir, params81, 1)

    model4 = MaskRCNN(TinyConfig(NUM_CLASSES=4))
    template = model4.init(jax.random.PRNGKey(7))

    with pytest.raises(ValueError, match="reinit_mismatched"):
        load_params(run_dir, template, model4.config.BACKBONE)

    pth = str(tmp_path / "w81.pth")
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in
                to_torch_state_dict(params81,
                                    model81.config.BACKBONE).items()}, pth)

    for src in (run_dir, pth):
        merged = load_params(src, template, model4.config.BACKBONE,
                             reinit_mismatched=True)
        flat_t = dict(jax.tree_util.tree_leaves_with_path(template))
        flat_81 = dict(jax.tree_util.tree_leaves_with_path(params81))
        reinit_names = {"linear_class", "linear_bbox", "conv5"}
        for kp, got in jax.tree_util.tree_leaves_with_path(merged):
            is_reinit = any(getattr(k, "key", None) in reinit_names
                            for k in kp)
            want = flat_t[kp] if is_reinit else flat_81[kp]
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want),
                err_msg=jax.tree_util.keystr(kp))


def test_prune_and_best(model_params, tmp_path):
    """keep-last-N retention + best-epoch marker (ROADMAP item 10)."""
    from maskrcnn_tpu.checkpoint.store import (best_epoch, latest_epoch,
                                               mark_best,
                                               prune_checkpoints,
                                               save_checkpoint)

    _, params = model_params
    run_dir = str(tmp_path / "run")
    for e in range(1, 7):
        save_checkpoint(run_dir, params, e)
    mark_best(run_dir, 2)
    prune_checkpoints(run_dir, keep_last=3)
    import os
    left = sorted(n for n in os.listdir(run_dir)
                  if n.startswith("epoch_"))
    # newest 3 plus the best-marked epoch survive
    assert left == ["epoch_0002", "epoch_0004", "epoch_0005",
                    "epoch_0006"]
    assert best_epoch(run_dir) == 2
    assert latest_epoch(run_dir) == 6
