"""CG solvers: single-device jitted loop, sharded SPMD loops, NumPy oracle."""

from tpucg.solver.cg import (
    CGResult,
    cg_solve,
    cg_solve_block,
    cg_solve_multi,
    spectral_interval,
)
from tpucg.solver.checkpoint import (
    cg_solve_checkpointed,
    sharded_cg_solve_checkpointed,
    sharded_operator_cg_solve_checkpointed,
)
from tpucg.solver.ir import cg_solve_ir, sharded_cg_solve_ir
from tpucg.solver.sharded import (
    load_system_sharded,
    sharded_cg_solve,
    sharded_cg_solve_block,
    sharded_cg_solve_multi,
    sharded_operator_cg_solve,
)
from tpucg.solver.oracle import oracle_cg
from tpucg.solver.operators import (
    BsrOperator,
    best_sparse_operator,
    DenseOperator,
    DiaOperator,
    EllOperator,
    WellOperator,
    LinearOperator,
    PoissonOperator,
)

__all__ = [
    "CGResult",
    "cg_solve",
    "cg_solve_block",
    "cg_solve_multi",
    "spectral_interval",
    "cg_solve_checkpointed",
    "sharded_cg_solve_checkpointed",
    "sharded_operator_cg_solve_checkpointed",
    "best_sparse_operator",
    "cg_solve_ir",
    "sharded_cg_solve_ir",
    "sharded_cg_solve",
    "sharded_cg_solve_block",
    "sharded_cg_solve_multi",
    "sharded_operator_cg_solve",
    "load_system_sharded",
    "oracle_cg",
    "LinearOperator",
    "BsrOperator",
    "DenseOperator",
    "DiaOperator",
    "EllOperator",
    "WellOperator",
    "PoissonOperator",
]
