"""CG solvers: single-device jitted loop, sharded SPMD loop, NumPy oracle."""

from tpucg.solver.cg import CGResult, cg_solve
from tpucg.solver.sharded import sharded_cg_solve
from tpucg.solver.oracle import oracle_cg
from tpucg.solver.operators import (
    DenseOperator,
    EllOperator,
    LinearOperator,
    PoissonOperator,
)

__all__ = [
    "CGResult",
    "cg_solve",
    "sharded_cg_solve",
    "oracle_cg",
    "LinearOperator",
    "DenseOperator",
    "EllOperator",
    "PoissonOperator",
]
