"""Utilities: visualization, profiling."""

from maskrcnn_tpu.utils.profiler import StageTimer, Throughput, trace
from maskrcnn_tpu.utils.visualize import (apply_mask, display_instances,
                                          plot_loss, random_colors)

__all__ = ["StageTimer", "Throughput", "trace", "apply_mask",
           "display_instances", "plot_loss", "random_colors"]
