"""Device meshes and communication strategies."""

from tpucg.comm.mesh import (
    COLS_AXIS,
    ROWS_AXIS,
    init_distributed,
    make_mesh,
    make_mesh2d,
)

__all__ = [
    "make_mesh",
    "make_mesh2d",
    "init_distributed",
    "ROWS_AXIS",
    "COLS_AXIS",
]
