"""Matrix/vector I/O: reference text format, generators, partitioning."""

from tpucg.io.textio import (
    load_matrix,
    load_matrix_rows,
    load_system,
    load_vector,
    save_array,
)
from tpucg.io.generator import generate_spd_system, poisson3d_csr
from tpucg.io.golden import GOLDEN_2X2, GOLDEN_4X4
from tpucg.io.mmio import load_matrix_market, save_matrix_market
from tpucg.io.partitioner import RowPartition, pad_identity_tail, pad_system

__all__ = [
    "load_matrix",
    "load_matrix_rows",
    "load_system",
    "load_vector",
    "save_array",
    "generate_spd_system",
    "poisson3d_csr",
    "GOLDEN_2X2",
    "GOLDEN_4X4",
    "load_matrix_market",
    "save_matrix_market",
    "RowPartition",
    "pad_identity_tail",
    "pad_system",
]
