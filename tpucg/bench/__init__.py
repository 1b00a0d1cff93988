"""Benchmark harness: three-phase timing and roofline analysis."""

from tpucg.bench.timing import (
    HBM_PEAK_BYTES_PER_S,
    BenchReport,
    auto_steps,
    hbm_peak_bytes_per_s,
    time_fn,
    time_matvec_loop,
    time_solve_chain,
)

__all__ = [
    "BenchReport",
    "auto_steps",
    "time_fn",
    "time_matvec_loop",
    "time_solve_chain",
    "hbm_peak_bytes_per_s",
    "HBM_PEAK_BYTES_PER_S",
]
