"""Kernel backend resolution."""

from __future__ import annotations

import os

import jax

# Set TPUCG_INTERPRET=1 to run Pallas kernels in interpreter mode (used by the
# CPU test suite so kernel code paths are exercised without TPU hardware).
def interpret_mode() -> bool:
    if os.environ.get("TPUCG_INTERPRET", "") == "1":
        return True
    return jax.default_backend() != "tpu"


def resolve_backend(kernel: str = "auto") -> str:
    """Map CGConfig.kernel to a concrete backend for this process."""
    if kernel in ("pallas", "xla"):
        return kernel
    if kernel != "auto":
        raise ValueError(f"unknown kernel backend {kernel!r}")
    if jax.default_backend() == "tpu":
        return "pallas"
    # Off-TPU, interpreted Pallas is orders of magnitude slower than XLA;
    # tests opt back in via TPUCG_INTERPRET / kernel="pallas".
    return "xla"
