"""Matrix/vector I/O: reference text format, generators, partitioning."""

from tpucg.io.textio import load_matrix, load_vector, save_array
from tpucg.io.generator import generate_spd_system, poisson3d_csr
from tpucg.io.partitioner import RowPartition, pad_system

__all__ = [
    "load_matrix",
    "load_vector",
    "save_array",
    "generate_spd_system",
    "poisson3d_csr",
    "RowPartition",
    "pad_system",
]
