"""Custom-dataset API: ArrayDataset + DetectionDataset contract.

The generic dataset surface (maskrcnn_tpu/data/dataset.py) restores the
matterport-lineage user-subclassable Dataset the reference fork dropped.
These tests pin the contract: original-coordinate loading, the fixed
canvas `sample` protocol, BatchLoader integration, and the in-memory
COCO export feeding the full AP stack (a perfect oracle detector must
score AP50 = 1.0 through it).
"""

import random

import numpy as np
import pytest

from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.data.dataset import ArrayDataset, mask_extent_box


def _shapes_dataset(cfg, n=4, seed=0):
    """Squares (class 1) + disks (class 2) on non-square canvases."""
    rng = np.random.RandomState(seed)
    images, masks, clses = [], [], []
    d = 96
    for _ in range(n):
        img = np.full((d, d - 16, 3), 20, np.uint8)
        ms, cs = [], []
        for _ in range(rng.randint(1, 3)):
            m = np.zeros(img.shape[:2], np.uint8)
            if rng.rand() < 0.5:
                y, x = rng.randint(8, d - 48, 2)
                h, w = rng.randint(12, 28, 2)
                m[y:y + h, x:x + w] = 1
                c = 1
            else:
                yy, xx = np.mgrid[0:d, 0:d - 16]
                cy = rng.randint(20, d - 30)
                cx = rng.randint(20, d - 40)
                r = rng.randint(8, 14)
                m = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(
                    np.uint8)
                c = 2
            img[m > 0] = (200, 80, 40) if c == 1 else (40, 80, 200)
            ms.append(m)
            cs.append(c)
        images.append(img)
        masks.append(np.stack(ms))
        clses.append(cs)
    return ArrayDataset(cfg, images, masks, clses,
                        class_names=["BG", "square", "disk"])


def test_load_boxes_match_mask_extents():
    cfg = TinyConfig()
    ds = _shapes_dataset(cfg)
    for i in range(len(ds)):
        image, cls, boxes, masks = ds.load(i, hflip=False)
        assert image.dtype == np.uint8 and image.ndim == 3
        assert len(cls) == len(boxes) == len(masks)
        for b, m in zip(boxes, masks):
            assert b.tolist() == mask_extent_box(m)
            y1, x1, y2, x2 = [int(v) for v in b]
            assert m[y1:y2, x1:x2].any()
            # extents are tight: nothing outside the box
            outside = m.copy()
            outside[y1:y2, x1:x2] = 0
            assert not outside.any()


def test_sample_fixed_shapes():
    cfg = TinyConfig()
    ds = _shapes_dataset(cfg)
    s = ds.sample(0, hflip=False)
    ch, cw = cfg.IMAGE_SHAPE[:2]
    g = cfg.MAX_GT_INSTANCES
    assert s["images"].shape == (ch, cw, 3)
    assert s["gt_class_ids"].shape == (g,)
    assert s["gt_boxes"].shape == (g, 4)
    assert s["gt_masks"].shape == (g, ch, cw)
    assert s["gt_valid"].shape == (g,)
    n = int(s["gt_valid"].sum())
    assert n == len(ds.masks[0])
    # canvas boxes still bound the canvas masks
    for j in range(n):
        y1, x1, y2, x2 = s["gt_boxes"][j].astype(int)
        assert s["gt_masks"][j, y1:y2, x1:x2].any()


def test_hflip_mirrors_image_and_masks():
    cfg = TinyConfig()
    ds = _shapes_dataset(cfg)
    base = ds.load(1, hflip=False)
    for seed in range(20):
        random.seed(seed)
        img, cls, boxes, masks = ds.load(1, hflip=True)
        if not np.array_equal(img, base[0]):  # a flip happened
            assert np.array_equal(img, base[0][:, ::-1])
            assert np.array_equal(masks, base[3][:, :, ::-1])
            w = img.shape[1]
            y1, x1, y2, x2 = base[2][0]
            assert boxes[0].tolist() == [y1, w - x2, y2, w - x1]
            return
    pytest.fail("20 seeded draws never flipped")


def test_empty_image_fallback():
    cfg = TinyConfig()
    img = np.zeros((64, 64, 3), np.uint8)
    ds = ArrayDataset(cfg, [img], [np.zeros((0, 64, 64), np.uint8)], [[]])
    image, cls, boxes, masks = ds.load(0)
    assert cls.tolist() == [0]
    assert boxes.tolist() == [[0.0, 0.0, 64.0, 64.0]]
    assert masks.shape == (1, 64, 64) and masks.all()
    s = ds.sample(0, hflip=False)
    assert not s["gt_valid"].any()


def test_to_coco_roundtrip():
    from maskrcnn_tpu.eval.coco_index import COCO
    cfg = TinyConfig()
    ds = _shapes_dataset(cfg)
    coco = COCO(ds.to_coco())
    assert sorted(coco.imgs.keys()) == ds.ids
    assert [c["name"] for c in coco.loadCats([1, 2])] == ["square", "disk"]
    for i, image_id in enumerate(ds.ids):
        anns = coco.loadAnns(coco.getAnnIds(imgIds=[image_id]))
        assert len(anns) == len(ds.masks[i])
        for j, ann in enumerate(anns):
            assert ann["category_id"] == int(ds.class_ids[i][j])
            assert np.array_equal(coco.annToMask(ann), ds.masks[i][j])
            y1, x1, y2, x2 = mask_extent_box(ds.masks[i][j])
            x, y, w, h = ann["bbox"]
            assert (x, y) == (x1, y1)
            assert (w, h) == (x2 - x1, y2 - y1)
            assert ann["area"] == ds.masks[i][j].sum()


def test_batchloader_integration():
    from maskrcnn_tpu.data.pipeline import BatchLoader
    cfg = TinyConfig()
    ds = _shapes_dataset(cfg)
    loader = BatchLoader(ds, batch_size=2, num_workers=1, prefetch=1,
                         hflip=False)
    try:
        batch = next(loader)
    finally:
        loader.close()
    ch, cw = cfg.IMAGE_SHAPE[:2]
    g = cfg.MAX_GT_INSTANCES
    assert batch["images"].shape == (2, ch, cw, 3)
    assert batch["gt_masks_packed"].shape == (2, g, ch, cw // 8)
    assert batch["gt_boxes"].shape == (2, g, 4)


class _OracleDetector:
    """Perfect detector: replays the dataset's own ground truth.

    evaluate_coco dispatches `dataset.ids[:limit]` in order, so a cursor
    reconstructs which images each chunk holds.
    """

    def __init__(self, ds):
        self.ds = ds
        self._cursor = 0

    def dispatch_batch(self, images):
        ids = self.ds.ids[self._cursor:self._cursor + len(images)]
        self._cursor += len(images)
        return ids

    def fetch(self, ids):
        outs = []
        for image_id in ids:
            i = image_id - 1
            masks = self.ds.masks[i]
            boxes = np.asarray([mask_extent_box(m) for m in masks],
                               np.float32)
            cls = np.asarray(self.ds.class_ids[i], np.int32)
            scores = np.linspace(0.99, 0.9, len(cls), dtype=np.float32)
            outs.append((cls, scores, boxes, masks))
        return outs


def test_perfect_detections_score_ap1():
    from maskrcnn_tpu.eval.coco_index import COCO
    from maskrcnn_tpu.eval.evaluate import evaluate_coco
    cfg = TinyConfig()
    ds = _shapes_dataset(cfg, n=6)
    coco = COCO(ds.to_coco())
    det = _OracleDetector(ds)
    stats = evaluate_coco(det, ds, coco, "bbox", batch_size=4)
    assert stats[1] == pytest.approx(1.0), f"bbox AP50 {stats[1]}"
    det2 = _OracleDetector(ds)
    stats = evaluate_coco(det2, ds, coco, "segm", batch_size=4)
    assert stats[1] == pytest.approx(1.0), f"segm AP50 {stats[1]}"


def test_keypoints_sample_and_coco_order():
    nk = 4
    cfg = TinyConfig(NUM_KEYPOINTS=nk)
    img = np.zeros((80, 60, 3), np.uint8)
    m = np.zeros((80, 60), np.uint8)
    m[10:40, 5:35] = 1
    img[m > 0] = 255
    # internal (y, x, v); one unlabeled point
    kp = np.asarray([[12, 7, 2], [20, 20, 2], [38, 30, 1], [0, 0, 0]],
                    np.float32)
    ds = ArrayDataset(cfg, [img], [m[None]], [[1]], keypoints=[kp[None]],
                      kp_hflip_perm=[1, 0, 2, 3])
    s = ds.sample(0, hflip=False)
    g = cfg.MAX_GT_INSTANCES
    assert s["gt_keypoints"].shape == (g, nk, 3)
    # canvas transform preserves visibility and scales labeled points
    assert (s["gt_keypoints"][0, :, 2] == kp[:, 2]).all()
    assert (s["gt_keypoints"][0, 3, :2] == 0).all()

    d = ds.to_coco()
    ann = d["annotations"][0]
    assert ann["num_keypoints"] == 3
    # COCO order is (x, y, v)
    assert ann["keypoints"][:3] == [7.0, 12.0, 2.0]

    # flip swaps partner indices and mirrors x
    base = ds.load(0, hflip=False)
    for seed in range(20):
        random.seed(seed)
        out = ds.load(0, hflip=True)
        if not np.array_equal(out[0], base[0]):
            kflip = out[4][0]
            w = img.shape[1]
            assert kflip[0, 1] == w - 1 - kp[1, 1]  # swapped partner
            assert kflip[0, 0] == kp[1, 0]
            return
    pytest.fail("20 seeded draws never flipped")
