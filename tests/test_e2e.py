"""End-to-end integration: synthetic COCO dir -> dataset -> detector ->
COCO evaluation round trip (the reference's eval.sh path, SURVEY 3.3)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from maskrcnn_tpu.api import Detector
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.coco import CocoDataset
from maskrcnn_tpu.eval.evaluate import evaluate_coco


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "val2014").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 1
    for i in range(1, 4):
        h, w = 96 + 8 * i, 120
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = f"COCO_val2014_{i:012d}.jpg"
        Image.fromarray(arr).save(root / "val2014" / name)
        images.append({"id": i, "height": h, "width": w,
                       "file_name": name})
        # one box + polygon annotation per image
        x, y, bw, bh = 10, 20, 40, 30
        poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
        anns.append({
            "id": aid, "image_id": i, "category_id": 1,
            "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            "segmentation": [poly],
        })
        aid += 1
    data = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": c, "name": f"c{c}"}
                       for c in range(1, 91)],
    }
    with open(root / "annotations" / "instances_minival2014.json",
              "w") as f:
        json.dump(data, f)
    return str(root)


def test_dataset_loads(coco_dir):
    ds = CocoDataset(coco_dir, "minival", 2014, TinyConfig())
    assert len(ds) == 3
    img = ds.load_image(ds.ids[0])
    assert img.ndim == 3 and img.shape[2] == 3
    image, cls, boxes, masks = ds.load(0)
    assert cls.tolist() == [1]
    np.testing.assert_allclose(boxes[0], [20, 10, 50, 50])
    assert masks[0].sum() == 40 * 30


def test_training_sample_shapes(coco_dir):
    cfg = TinyConfig()
    ds = CocoDataset(coco_dir, "minival", 2014, cfg)
    s = ds.sample(0, hflip=False)
    d, g = cfg.IMAGE_MAX_DIM, cfg.MAX_GT_INSTANCES
    assert s["images"].shape == (d, d, 3)
    assert s["gt_boxes"].shape == (g, 4)
    assert s["gt_masks"].shape == (g, d, d)
    assert s["gt_valid"].sum() == 1
    # encoded mask stays consistent with encoded box
    y1, x1, y2, x2 = s["gt_boxes"][0].astype(int)
    assert s["gt_masks"][0, y1:y2, x1:x2].mean() > 0.6


def test_full_eval_roundtrip(coco_dir):
    """Random weights produce junk detections; the pipeline, the result
    format, and COCOeval must still round-trip without error."""
    cfg = TinyConfig()
    ds = CocoDataset(coco_dir, "minival", 2014, cfg)
    detector = Detector(cfg)
    stats = evaluate_coco(detector, ds, ds.coco, "bbox", limit=3,
                          batch_size=2)
    assert stats.shape == (12,)
    stats = evaluate_coco(detector, ds, ds.coco, "segm", limit=3,
                          batch_size=2)
    assert stats.shape == (12,)


def test_device_mask_decode_matches_host(coco_dir):
    """A/B gate (VERDICT r1 item 3): device-side original-coordinate
    masks vs the reference-parity host PIL decode path."""
    cfg = TinyConfig()
    ds = CocoDataset(coco_dir, "minival", 2014, cfg)
    imgs = [ds.load_image(ds.image_id(i)) for i in range(2)]

    dev = Detector(cfg.replace(DEVICE_MASK_DECODE=True))
    host = Detector(cfg.replace(DEVICE_MASK_DECODE=False),
                    params=dev.params)
    a = dev.detect_batch(imgs)
    b = host.detect_batch(imgs)
    for ra, rb in zip(a, b):
        assert (ra is None) == (rb is None)
        if ra is None:
            continue
        ca, sa, ba, ma = ra
        cb, sb, bb, mb = rb
        assert ca == cb
        np.testing.assert_allclose(sa, sb, rtol=1e-5)
        np.testing.assert_allclose(ba, bb, rtol=1e-5, atol=1e-3)
        ma = np.asarray(ma, bool)
        mb = np.asarray(mb, bool)
        assert ma.shape == mb.shape
        # random-weight masks are noisy; still, the two decodes may only
        # disagree on the 0.5 iso-contour
        assert (ma != mb).mean() < 0.02


@pytest.mark.slow
def test_sharded_detector_matches_single_device(coco_dir):
    """Detector with NUM_DEVICES=8 shards detect_batch over the CPU mesh
    and must reproduce single-device results (incl. the padded-batch
    path: 3 images over 8 devices)."""
    cfg = TinyConfig()
    single = Detector(cfg)
    sharded = Detector(cfg.replace(NUM_DEVICES=8), params=single.params)
    ds = CocoDataset(coco_dir, "minival", 2014, cfg)
    imgs = [ds.load_image(ds.image_id(i)) for i in range(3)]

    a = single.detect_batch(imgs)
    b = sharded.detect_batch(imgs)
    for ra, rb in zip(a, b):
        assert (ra is None) == (rb is None)
        if ra is None:
            continue
        assert ra[0] == rb[0]
        np.testing.assert_allclose(ra[1], rb[1], rtol=1e-5)
        np.testing.assert_allclose(ra[2], rb[2], rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(ra[3]),
                                      np.asarray(rb[3]))


def test_batch_loader(coco_dir):
    """Threaded loader produces well-formed packed batches."""
    from maskrcnn_tpu.data.pipeline import BatchLoader

    cfg = TinyConfig()
    ds = CocoDataset(coco_dir, "minival", 2014, cfg)
    loader = BatchLoader(ds, batch_size=2, num_workers=2, prefetch=2)
    try:
        batch = next(loader)
        d, g = cfg.IMAGE_MAX_DIM, cfg.MAX_GT_INSTANCES
        assert batch["images"].shape == (2, d, d, 3)
        assert batch["gt_masks_packed"].shape == (2, g, d, d // 8)
        assert batch["gt_valid"].shape == (2, g)
        assert batch["gt_valid"].any()
        batch2 = next(loader)
        assert batch2["images"].shape == (2, d, d, 3)
    finally:
        loader.close()
