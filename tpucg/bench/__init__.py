"""Benchmark harness: three-phase timing and roofline analysis."""

from tpucg.bench.timing import (
    HBM_PEAK_BYTES_PER_S,
    BenchReport,
    hbm_peak_bytes_per_s,
    time_fn,
)

__all__ = [
    "BenchReport",
    "time_fn",
    "hbm_peak_bytes_per_s",
    "HBM_PEAK_BYTES_PER_S",
]
