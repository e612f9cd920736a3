"""Profiling and throughput instrumentation.

The reference's only perf tooling is wall-clock prints in evaluate_coco
(reference: coco.py:92-135). This module adds the TPU-native equivalents
(SURVEY.md section 5): jax.profiler trace capture for xprof, per-stage
timers, and an images/sec meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def enable_compile_cache(
        path: str = "/tmp/maskrcnn_tpu_jax_cache") -> None:
    """Persistent XLA compile cache: the 1024px train/predict graphs take
    minutes to compile cold; cached reloads are seconds. Safe to call
    multiple times."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            c = self.counts[name]
            lines.append(f"{name:24s} total {t:8.3f}s  calls {c:5d}"
                         f"  avg {1e3 * t / c:8.2f}ms")
        return "\n".join(lines)


class Throughput:
    """images/sec meter (reproduces the reference's published metric,
    coco.py:133-135 / README.md:53)."""

    def __init__(self):
        self.images = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_images: int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.images += n_images

    @property
    def images_per_sec(self) -> float:
        return self.images / self.seconds if self.seconds else 0.0
