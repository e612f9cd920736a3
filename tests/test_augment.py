"""Augmentation pipeline (data/augment.py): geometry correctness under
crop/scale jitter, photometric bounds, static output shapes, and the
CLI spec parser."""

import random

import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.augment import Augmenter
from maskrcnn_tpu.data.codecs import resize_image
from maskrcnn_tpu.data.dataset import ArrayDataset, mask_extent_box


def _instances(d=64):
    img = np.full((d, d, 3), 40, np.uint8)
    m1 = np.zeros((d, d), np.uint8)
    m1[8:24, 8:28] = 1
    m2 = np.zeros((d, d), np.uint8)
    m2[40:60, 44:62] = 1
    img[m1 > 0] = (200, 50, 50)
    img[m2 > 0] = (50, 200, 50)
    masks = np.stack([m1, m2])
    cls = np.asarray([1, 2], np.int32)
    boxes = np.asarray([mask_extent_box(m) for m in masks], np.float32)
    return img, cls, boxes, masks


def test_parse_spec():
    a = Augmenter.parse("scale=0.8:1.25,crop=0.7:1.0,color=0.2")
    assert a.scale_range == (0.8, 1.25)
    assert a.crop_range == (0.7, 1.0)
    assert a.brightness == a.contrast == a.saturation == 0.2
    b = Augmenter.parse("brightness=0.1,min_visible=4")
    assert b.brightness == 0.1 and b.contrast == 0.0
    assert b.min_visible == 4
    with pytest.raises(ValueError):
        Augmenter.parse("zoom=2")


def test_identity_augmenter_is_noop():
    img, cls, boxes, masks = _instances()
    out = Augmenter()(img, cls, boxes, masks, None)
    assert out[0] is img and out[3] is masks
    assert out[5] == 1.0


def test_photometric_stays_valid_uint8():
    img, cls, boxes, masks = _instances()
    a = Augmenter(brightness=0.3, contrast=0.3, saturation=0.3)
    random.seed(0)
    out, _, _, out_masks, _, _ = a(img, cls, boxes, masks, None)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert not np.array_equal(out, img)
    assert out_masks is masks  # photometric never touches geometry


def test_crop_keeps_extent_boxes_and_drops_invisible():
    img, cls, boxes, masks = _instances()
    a = Augmenter(crop_range=(0.5, 0.5), min_visible=16)
    hit_drop = hit_keep = False
    for seed in range(40):
        random.seed(seed)
        oimg, ocls, oboxes, omasks, _, _ = a(img, cls, boxes, masks, None)
        assert oimg.shape[:2] == omasks.shape[1:]
        assert len(ocls) == len(oboxes) == len(omasks) >= 1
        for b, m in zip(oboxes, omasks):
            assert b.tolist() == mask_extent_box(m)
            assert m.sum() >= 16
        if len(ocls) < 2:
            hit_drop = True
        else:
            hit_keep = True
        # surviving labels are a subset of the originals
        assert set(ocls.tolist()) <= {1, 2}
    assert hit_drop and hit_keep, "50% crop should sometimes split the pair"


def test_crop_skipped_when_all_would_vanish():
    d = 64
    img = np.zeros((d, d, 3), np.uint8)
    m = np.zeros((d, d), np.uint8)
    m[0:3, 0:3] = 1  # 9 px < min_visible once clipped by most crops
    cls = np.asarray([1], np.int32)
    boxes = np.asarray([mask_extent_box(m)], np.float32)
    a = Augmenter(crop_range=(0.3, 0.3), min_visible=16)
    random.seed(1)
    oimg, ocls, _, omasks, _, _ = a(img, cls, boxes, m[None], None)
    assert oimg.shape == img.shape  # crop skipped, nothing dropped
    assert len(ocls) == 1


def test_crop_transforms_keypoints():
    img, cls, boxes, masks = _instances()
    # kp A inside instance-1's mask region, kp B far away (other corner)
    kps = np.asarray([[[10, 10, 2], [58, 58, 2]],
                      [[50, 50, 2], [4, 4, 2]]], np.float32)
    a = Augmenter(crop_range=(0.5, 0.5), min_visible=8)
    for seed in range(40):
        random.seed(seed)
        out = a(img, cls, boxes, masks, kps)
        okps = out[4]
        oimg = out[0]
        if okps is None or len(okps) != 2 or oimg.shape == img.shape:
            continue
        h, w = oimg.shape[:2]
        for inst in okps:
            for y, x, v in inst:
                if v > 0:
                    assert 0 <= y < h and 0 <= x < w
                else:
                    assert y == 0 and x == 0
        return
    pytest.fail("no seed produced a 2-survivor crop")


def test_resize_scale_mult_shrinks_window():
    img = np.full((64, 64, 3), 99, np.uint8)
    canvas, window, scale = resize_image(img, 64, 64, scale_mult=0.5)
    assert canvas.shape == (64, 64, 3)
    assert scale == 0.5
    y1, x1, y2, x2 = window
    assert (y2 - y1, x2 - x1) == (32, 32)
    assert (canvas[y1:y2, x1:x2] == 99).all()
    assert canvas[0, 0].tolist() == [0, 0, 0]  # letterbox padding
    # upscale jitter is capped by the canvas fit
    _, window2, scale2 = resize_image(img, 64, 64, scale_mult=2.0)
    assert scale2 == 1.0 and window2 == (0, 0, 64, 64)


def test_sample_with_augment_keeps_static_shapes():
    cfg = TinyConfig()
    img, cls, boxes, masks = _instances(96)
    ds = ArrayDataset(cfg, [img], [masks], [cls])
    a = Augmenter(scale_range=(0.5, 0.9), crop_range=(0.6, 1.0),
                  brightness=0.2, min_visible=8)
    ch, cw = cfg.IMAGE_SHAPE[:2]
    g = cfg.MAX_GT_INSTANCES
    random.seed(3)
    for _ in range(5):
        s = ds.sample(0, hflip=True, augment=a)
        assert s["images"].shape == (ch, cw, 3)
        assert s["gt_masks"].shape == (g, ch, cw)
        assert s["gt_boxes"].shape == (g, 4)
        n = int(s["gt_valid"].sum())
        assert 1 <= n <= 2
        # canvas boxes still bound canvas masks after jitter
        for j in range(n):
            y1, x1, y2, x2 = np.clip(s["gt_boxes"][j], 0,
                                     [ch, cw, ch, cw]).astype(int)
            assert s["gt_masks"][j, y1:y2, x1:x2].any()


def test_batchloader_threads_augmenter():
    from maskrcnn_tpu.data.pipeline import BatchLoader
    cfg = TinyConfig()
    img, cls, boxes, masks = _instances(96)
    ds = ArrayDataset(cfg, [img] * 4, [masks] * 4, [cls] * 4)
    a = Augmenter(scale_range=(0.5, 0.5))
    loader = BatchLoader(ds, batch_size=2, num_workers=1, prefetch=1,
                         hflip=False, pack_bits=False, augment=a)
    try:
        batch = next(loader)
    finally:
        loader.close()
    ch, cw = cfg.IMAGE_SHAPE[:2]
    assert batch["images"].shape == (2, ch, cw, 3)
    # the 0.5x jitter shrinks the drawn content into the letterbox: the
    # outer border must be padding
    assert (batch["images"][:, 0, :, :] == 0).all()
    assert (batch["images"][:, :, 0, :] == 0).all()
