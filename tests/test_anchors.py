"""Anchor generator tests against reference-documented golden values.

Golden values come from the reference's own captured debug output
(utils.py:140-151, 464-470 in data.py docstrings and SURVEY.md): the
261,888-anchor count at 1024x1024, the first-level corner anchors, and
the per-level counts.
"""

import numpy as np

from maskrcnn_tpu.config import CocoConfig
from maskrcnn_tpu.ops import anchors as A


def test_coco_anchor_count():
    cfg = CocoConfig()
    anch = A.config_anchors(cfg)
    assert anch.shape == (261888, 4)
    assert cfg.NUM_ANCHORS == 261888


def test_per_level_counts():
    cfg = CocoConfig()
    counts = [
        A.generate_level_anchors(cfg.RPN_ANCHOR_SCALES[i],
                                 cfg.RPN_ANCHOR_RATIOS,
                                 cfg.BACKBONE_SHAPES[i],
                                 cfg.BACKBONE_STRIDES[i],
                                 cfg.RPN_ANCHOR_STRIDE).shape[0]
        for i in range(5)
    ]
    assert counts == [196608, 49152, 12288, 3072, 768]


def test_first_anchors_golden():
    """First anchors at (0,0) for scale 32 (data.py:464-470 debug dump)."""
    cfg = CocoConfig()
    anch = A.config_anchors(cfg)
    expected = np.array([
        [-22.627417, -11.3137085, 22.627417, 11.3137085],
        [-16.0, -16.0, 16.0, 16.0],
        [-11.3137085, -22.627417, 11.3137085, 22.627417],
    ])
    np.testing.assert_allclose(anch[:3], expected, rtol=1e-5)
    # Last anchors of the pyramid (scale 512, stride 64, shifted to 960).
    expected_last = np.array([
        [597.96132803, 778.98066402, 1322.03867197, 1141.01933598],
        [704.0, 704.0, 1216.0, 1216.0],
        [778.98066402, 597.96132803, 1141.01933598, 1322.03867197],
    ])
    np.testing.assert_allclose(anch[-3:], expected_last, rtol=1e-5)


def test_anchor_ordering_y_x_ratio():
    """Anchor order must be (y, x, ratio) to match the RPN reshape
    (reference model.py:627-641): second triple shifts x by the stride."""
    cfg = CocoConfig()
    anch = A.config_anchors(cfg)
    # anchors 3..5 = same y, x shifted by stride 4
    np.testing.assert_allclose(anch[3:6, 1] - anch[0:3, 1], 4.0)
    np.testing.assert_allclose(anch[3:6, 0], anch[0:3, 0])
