"""Device meshes and communication strategies."""

from tpucg.comm.mesh import make_mesh, ROWS_AXIS

__all__ = ["make_mesh", "ROWS_AXIS"]
