"""Utilities: visualization, profiling."""

from maskrcnn_tpu.utils.profiler import (StageTimer, Throughput,
                                         enable_compile_cache, trace)
from maskrcnn_tpu.utils.progress import progress
from maskrcnn_tpu.utils.visualize import (apply_mask, display_instances,
                                          plot_loss, random_colors)

__all__ = ["StageTimer", "Throughput", "enable_compile_cache", "trace",
           "progress", "apply_mask", "display_instances", "plot_loss",
           "random_colors"]
