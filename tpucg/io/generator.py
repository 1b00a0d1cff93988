"""Test-system generators.

``generate_spd_system`` reproduces the construction in the reference's
``generateSPDmatrix.m:4-17``: A = 0.5*(R + R') + n*I for uniform random R —
symmetric and strictly diagonally dominant, hence SPD and well-conditioned
(CG converges in a handful of iterations, which is why the reference's
benchmarks are distribution-dominated; BASELINE.md).

``poisson3d_csr`` builds the 3-D 7-point Poisson Laplacian in CSR form — the
sparse benchmark workload from BASELINE.json (n = m^3 grid). The matrix-free
stencil form of the same operator lives in ``tpucg.solver.operators.PoissonOperator``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tpucg.sparse.formats import CSRMatrix


def generate_spd_system(
    n: int,
    seed: int = 0,
    dtype=np.float32,
    x0: str = "zeros",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random dense SPD system (A, b, x0) a la ``generateSPDmatrix.m``.

    A = 0.5*(R + R^T) + n*I with R, b ~ U[0,1); x0 is zeros (the .m script's
    choice, ``generateSPDmatrix.m:8``) or ``"random"``.
    """
    rng = np.random.default_rng(seed)
    R = rng.random((n, n), dtype=np.float64)
    A = 0.5 * (R + R.T) + n * np.eye(n)
    b = rng.random(n, dtype=np.float64)
    if x0 == "zeros":
        x = np.zeros(n, dtype=dtype)
    elif x0 == "random":
        x = rng.random(n).astype(dtype)
    else:
        raise ValueError(f"unknown x0 mode {x0!r}")
    return A.astype(dtype), b.astype(dtype), x


def poisson3d_csr(m: int, dtype=np.float32) -> CSRMatrix:
    """7-point Laplacian on an m*m*m grid with Dirichlet boundaries, as CSR.

    Row i=(ix,iy,iz) has diagonal 6 and -1 for each in-grid neighbor; SPD.
    Built vectorized (no Python-per-row loop) so m=128 (n=2M rows) is fast.
    """
    n = m * m * m
    idx = np.arange(n, dtype=np.int64)
    ix, rem = np.divmod(idx, m * m)
    iy, iz = np.divmod(rem, m)

    offsets = []  # (col_delta, validity mask)
    offsets.append((-m * m, ix > 0))
    offsets.append((-m, iy > 0))
    offsets.append((-1, iz > 0))
    offsets.append((0, np.ones(n, dtype=bool)))
    offsets.append((1, iz < m - 1))
    offsets.append((m, iy < m - 1))
    offsets.append((m * m, ix < m - 1))

    cols_parts = []
    vals_parts = []
    rows_parts = []
    for delta, mask in offsets:
        rows_parts.append(idx[mask])
        cols_parts.append(idx[mask] + delta)
        v = np.full(mask.sum(), -1.0 if delta != 0 else 6.0, dtype=dtype)
        vals_parts.append(v)
    rows = np.concatenate(rows_parts)
    cols = np.concatenate(cols_parts)
    vals = np.concatenate(vals_parts)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    return CSRMatrix(
        indptr=indptr, indices=cols.astype(np.int32), data=vals, shape=(n, n)
    )
