#!/usr/bin/env python
"""Throughput cost of the high-IoU int8 config (QUANT_SKIP=("RPN",)).

The r5 accuracy ablation (benchmarks/int8_stage_ablation_r5.json)
found the quantized RPN shared conv is the int8 pipeline's main bbox
AP75 cost: mse-calib int8 with a FLOAT RPN recovers
bbox AP75 0.388 -> 0.443 (float reference 0.509) and lifts segm AP to
0.495. Skipping the RPN also reverts the RoIAlign tables to bf16 (the
int8 tables reuse the RPN's per-level scales; measured AP-neutral, so
nothing else is lost). This gate prices that trade at the serving
batch: full-int8 vs int8+fp-RPN vs bf16, b32, median of 3 fori_loop
runs — the number the "high-IoU int8" row of the accuracy-frontier
table needs (VERDICT r4 #2: record the rejection/ship frontier the way
the perf gates do).

    python benchmarks/gates/int8_fp_rpn_cost_gate.py
"""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from bench import bench  # noqa: E402

if __name__ == "__main__":
    rows = {}
    for name, over in [
            ("int8-full", {"QUANT_INT8": True}),
            ("int8-fp-RPN", {"QUANT_INT8": True, "QUANT_SKIP": ("RPN",)}),
            ("int8-fp-C45", {"QUANT_INT8": True,
                             "QUANT_SKIP": ("C4", "C5")}),
            ("bf16", {})]:
        best, b, ladder = bench(batch_sizes=(32,), overrides=over)
        rows[name] = best
        print(f"{name}: {best:.1f} img/s at b{b} {ladder}", flush=True)
    full = rows["int8-full"]
    for name in ("int8-fp-RPN", "int8-fp-C45"):
        print(f"{name} cost: {rows[name] / full:.3f}x of full-int8 "
              f"({full:.1f} -> {rows[name]:.1f} img/s at b32)")
