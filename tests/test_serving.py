"""Serving tests: micro-batching semantics + the HTTP surface."""

import threading

import numpy as np
import pytest

from maskrcnn_tpu.api import Detector
from maskrcnn_tpu.config import TinyConfig
from maskrcnn_tpu.serving import BatchingDetector


@pytest.fixture(scope="module")
def batcher():
    det = Detector(TinyConfig(DETECTION_MIN_CONFIDENCE=0.0))
    b = BatchingDetector(det, max_batch=4, max_delay_ms=30.0)
    yield b
    b.close()


def test_concurrent_requests_are_batched(batcher, rng):
    imgs = [(rng.rand(96, 120, 3) * 255).astype(np.uint8)
            for _ in range(8)]
    futures = [batcher.submit(im) for im in imgs]
    results = [f.result(timeout=300) for f in futures]
    assert len(results) == 8
    for r in results:
        assert isinstance(r, tuple) and len(r) == 4
    # 8 concurrent submits at max_batch=4 must not have run 8 batches
    assert batcher.batches_run <= 6
    assert batcher.images_run == 8

    # results must match a direct single-image detect (same Detector)
    direct = batcher.detector.detect(imgs[0])
    got = results[0]
    if direct[0] is None:
        assert got[0] is None
    else:
        assert got[0] == direct[0]
        np.testing.assert_allclose(got[1], direct[1], rtol=1e-5)


def test_dispatch_fetch_split_matches_detect_batch(batcher, rng):
    """Detector.dispatch_batch + fetch (the pipelined serving path) must
    equal the monolithic detect_batch exactly."""
    det = batcher.detector
    imgs = [(rng.rand(90, 110, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    direct = det.detect_batch(imgs)
    split = det.fetch(det.dispatch_batch(imgs))
    for a, b in zip(direct, split):
        if a is None:
            assert b is None
            continue
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])
        np.testing.assert_array_equal(a[3], b[3])


def test_pipeline_sustains_many_batches(batcher, rng):
    """More batches than the 2-deep pipeline can hold at once: every
    future resolves, none deadlock."""
    imgs = [(rng.rand(64, 80, 3) * 255).astype(np.uint8)
            for _ in range(12)]
    futures = [batcher.submit(im) for im in imgs]
    results = [f.result(timeout=300) for f in futures]
    assert all(isinstance(r, tuple) and len(r) == 4 for r in results)


def test_close_resolves_everything():
    det = Detector(TinyConfig(DETECTION_MIN_CONFIDENCE=0.0))
    b = BatchingDetector(det, max_batch=2, max_delay_ms=1.0)
    img = np.zeros((64, 80, 3), np.uint8)
    futs = [b.submit(img) for _ in range(4)]
    b.close()
    for f in futs:
        try:
            f.result(timeout=60)  # either a real result...
        except RuntimeError:      # ...or the explicit closed error
            pass
    post = b.submit(img)
    with pytest.raises(RuntimeError):
        post.result(timeout=10)


def test_http_server_roundtrip(tmp_path, rng):
    """Drive tools/serve.py's handler through a real socket."""
    import io
    import json
    import urllib.request
    from http.server import ThreadingHTTPServer

    from PIL import Image

    import tools.serve as serve
    from maskrcnn_tpu.data.coco import COCO_CLASS_NAMES

    det = Detector(TinyConfig(DETECTION_MIN_CONFIDENCE=0.0))
    b = BatchingDetector(det, max_batch=2, max_delay_ms=5.0)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(b, COCO_CLASS_NAMES))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r)["ok"] is True

        buf = io.BytesIO()
        Image.fromarray((rng.rand(80, 100, 3) * 255).astype(
            np.uint8)).save(buf, "PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.load(r)
        assert "detections" in out
        for d in out["detections"]:
            assert set(d) == {"class_id", "class_name", "score", "box",
                              "mask_rle"}
            assert len(d["box"]) == 4
    finally:
        server.shutdown()
        b.close()
