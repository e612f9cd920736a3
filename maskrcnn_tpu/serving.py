"""Serving: request micro-batching around the Detector.

The reference has no serving story (predict.py is a one-shot CLI). For
production TPU serving the unit of efficiency is the batch — the device
pipeline runs ~2x faster per image at batch 32+ than at batch 1
(BENCHMARKS.md) — so this wrapper coalesces concurrent single-image
requests into device batches:

* callers submit images from any thread and block on a Future;
* a dispatcher thread drains the queue, waits at most `max_delay_ms`
  to fill up to `max_batch`, preprocesses, and launches the device
  pipeline asynchronously (`Detector.dispatch_batch` — JAX dispatch
  returns as soon as the work is enqueued);
* a fetcher thread blocks on the device output and runs the host
  decode (`Detector.fetch`), so batch N's d2h transfer + decode
  overlaps batch N+1's device compute — a 2-deep pipeline bounded by
  a maxsize-1 handoff queue (backpressure, no unbounded device work);
* batches are padded to a small set of sizes (1, 2, 4, ..., max_batch)
  so XLA compiles a handful of graphs, not one per arrival pattern.

`tools/serve.py` exposes this over HTTP.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Tuple

import numpy as np

from maskrcnn_tpu.api import Detector


def _pad_size(n: int, max_batch: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, max_batch)


class BatchingDetector:
    """Thread-safe micro-batching front end over one Detector."""

    def __init__(self, detector: Detector, max_batch: int = 32,
                 max_delay_ms: float = 10.0):
        self.detector = detector
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self._q: "queue.Queue[Tuple[np.ndarray, Future]]" = queue.Queue()
        # dispatcher -> fetcher handoff; maxsize=1 caps in-flight device
        # batches at 2 (one executing, one enqueued)
        self._inflight: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._fetcher = threading.Thread(target=self._fetch_loop,
                                         daemon=True)
        self._worker.start()
        self._fetcher.start()
        self.batches_run = 0
        self.images_run = 0

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one RGB uint8 image; resolves to the detect() tuple.

        After close() the future resolves immediately with a
        RuntimeError — a caller blocked on .result() must never hang on
        a request no worker will ever drain."""
        f: Future = Future()
        if self._stop.is_set():
            f.set_exception(RuntimeError("BatchingDetector is closed"))
            return f
        self._q.put((image, f))
        return f

    def detect(self, image: np.ndarray, timeout: Optional[float] = None):
        return self.submit(image).result(timeout)

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
        self._fetcher.join(timeout=5)
        # resolve anything still queued (including racy submits that got
        # in between the worker's last drain and thread exit)
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("BatchingDetector closed "
                                               "before request ran"))
        while True:
            try:
                _, batch = self._inflight.get_nowait()
            except queue.Empty:
                break
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(RuntimeError(
                        "BatchingDetector closed before result fetched"))

    # ------------------------------------------------------------------
    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_delay
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            images = [b[0] for b in batch]
            # pad with a repeat of the last image to a bucketed size so
            # the jit cache stays small; padded results are dropped
            target = _pad_size(len(images), self.max_batch)
            padded = images + [images[-1]] * (target - len(images))
            try:
                handle = self.detector.dispatch_batch(padded)
            except Exception as e:  # resolve everyone; server stays up
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            # blocks when a batch is already waiting behind the one on
            # device — the natural backpressure of a 2-deep pipeline
            handed_off = False
            while not self._stop.is_set():
                try:
                    self._inflight.put((handle, batch), timeout=0.1)
                    handed_off = True
                    break
                except queue.Full:
                    continue
            if not handed_off:  # closed mid-handoff: don't strand callers
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(RuntimeError(
                            "BatchingDetector closed before result "
                            "fetched"))

    def _fetch_loop(self):
        while not (self._stop.is_set() and self._inflight.empty()):
            try:
                handle, batch = self._inflight.get(timeout=0.1)
            except queue.Empty:
                if self._stop.is_set():
                    break
                continue
            try:
                results = self.detector.fetch(handle)
                self.batches_run += 1
                self.images_run += len(batch)
                for (_, fut), res in zip(batch, results):
                    n_fields = (5 if self.detector.config.NUM_KEYPOINTS
                                else 4)  # + keypoints when branch is on
                    none_tuple = (None,) * n_fields
                    fut.set_result(res if res is not None else none_tuple)
            except Exception as e:
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
