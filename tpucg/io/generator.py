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


def _poisson3d_deltas_masks(m: int):
    """The 7-point stencil's column deltas (ascending) and per-row validity
    masks — shared by the CSR and DIA constructors."""
    n = m * m * m
    idx = np.arange(n, dtype=np.int64)
    ix, rem = np.divmod(idx, m * m)
    iy, iz = np.divmod(rem, m)
    deltas = (-m * m, -m, -1, 0, 1, m, m * m)
    masks = (
        ix > 0, iy > 0, iz > 0, np.ones(n, dtype=bool),
        iz < m - 1, iy < m - 1, ix < m - 1,
    )
    return n, idx, deltas, masks


def generate_spd_system_f32(
    n: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Memory-lean float32 variant of ``generate_spd_system`` for large n.

    Same construction (A = 0.5*(R + R^T) + n*I, R/b ~ U[0,1)) but computed
    in float32 with in-place updates and no dense eye: peak host memory is
    2 * n^2 * 4 bytes (vs ~3 * n^2 * 8 for the float64 path — 100 GB at
    n=65536). Draws a different random stream than the f64 version.
    """
    rng = np.random.default_rng(seed)
    A = rng.random((n, n), dtype=np.float32)
    A = A + A.T
    A *= np.float32(0.5)
    idx = np.arange(n)
    A[idx, idx] += np.float32(n)
    b = rng.random(n, dtype=np.float32)
    return A, b, np.zeros(n, np.float32)


def poisson3d_csr(m: int, dtype=np.float32) -> CSRMatrix:
    """7-point Laplacian on an m*m*m grid with Dirichlet boundaries, as CSR.

    Row i=(ix,iy,iz) has diagonal 6 and -1 for each in-grid neighbor; SPD.
    Built vectorized AND pre-sorted: within a row the 7 candidate columns are
    laid out in ascending-delta order, so flattening the (n, 7) candidate
    grid row-major is already CSR order — no lexsort (which dominated the
    m=128 build at ~10 s for 14.6M triples).
    """
    n, idx, deltas, masks = _poisson3d_deltas_masks(m)
    mask2 = np.stack(masks, axis=1)                      # (n, 7)
    cols2 = idx[:, None] + np.asarray(deltas)            # (n, 7)
    vals_row = np.asarray([-1, -1, -1, 6, -1, -1, -1], dtype=dtype)
    keep = mask2.reshape(-1)
    cols = cols2.reshape(-1)[keep]
    vals = np.broadcast_to(vals_row, (n, 7)).reshape(-1)[keep]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(mask2.sum(axis=1), out=indptr[1:])
    return CSRMatrix(
        indptr=indptr, indices=cols.astype(np.int32), data=vals, shape=(n, n)
    )


def poisson3d_dia(m: int, dtype=np.float32):
    """7-point Laplacian directly in DIA form (no CSR intermediate).

    ``data[d, i] = A[i, i + offsets[d]]`` with out-of-grid neighbors zero —
    the analytic form of ``csr_to_dia(poisson3d_csr(m))``, built in O(n).
    """
    from tpucg.sparse.formats import DIAMatrix

    n, idx, deltas, masks = _poisson3d_deltas_masks(m)
    data = np.zeros((7, n), dtype=dtype)
    for d, (delta, mask) in enumerate(zip(deltas, masks)):
        data[d, mask] = -1.0 if delta != 0 else 6.0
    return DIAMatrix(
        offsets=np.asarray(deltas, dtype=np.int64), data=data, shape=(n, n)
    )
