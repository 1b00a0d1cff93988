"""Sparse container round trips and the Poisson generator."""

import numpy as np

from tpucg.io.generator import poisson3d_csr
from tpucg.sparse.formats import COOMatrix, csr_to_ell


def test_poisson_csr_structure():
    m = 4
    csr = poisson3d_csr(m)
    n = m**3
    assert csr.shape == (n, n)
    A = csr.to_dense()
    np.testing.assert_allclose(A, A.T)
    assert np.all(np.diag(A) == 6.0)
    # interior point has 6 neighbors
    assert csr.row_lengths.max() == 7
    assert csr.row_lengths.min() == 4  # corner: 3 neighbors + diag
    eigs = np.linalg.eigvalsh(A.astype(np.float64))
    assert eigs.min() > 0


def test_coo_csr_round_trip():
    rng = np.random.default_rng(0)
    n = 12
    row = rng.integers(0, n, 30)
    col = rng.integers(0, n, 30)
    val = rng.standard_normal(30).astype(np.float32)
    coo = COOMatrix(row=row, col=col, data=val, shape=(n, n))
    dense = coo.to_dense()
    csr = coo.to_csr()
    np.testing.assert_allclose(csr.to_dense(), dense, rtol=1e-6)
    back = csr.to_coo()
    np.testing.assert_allclose(back.to_dense(), dense, rtol=1e-6)


def test_csr_to_ell_padding():
    csr = poisson3d_csr(3)
    ell = csr_to_ell(csr, width_align=8)
    assert ell.row_width == 8  # max 7 nnz padded to 8
    # padded entries are zero-valued at column 0
    x = np.arange(csr.shape[0], dtype=np.float32)
    y_ell = (ell.values * x[ell.indices]).sum(axis=1)
    np.testing.assert_allclose(y_ell, csr.matvec(x), rtol=1e-5, atol=1e-5)


def test_csr_to_bsr_round_trip():
    from tpucg.sparse.formats import csr_to_bsr

    csr = poisson3d_csr(4)  # n=64, divisible by bs=4
    bsr = csr_to_bsr(csr, blocksize=4)
    np.testing.assert_allclose(bsr.to_dense(), csr.to_dense())
    assert bsr.blocksize == 4
    assert bsr.nnz == csr.nnz
    x = np.arange(csr.shape[0], dtype=np.float32)
    np.testing.assert_allclose(bsr.matvec(x), csr.matvec(x), rtol=1e-6)


def test_bsr_operator_spmv_and_diag():
    import jax.numpy as jnp

    from tpucg.solver.operators import BsrOperator
    from tpucg.sparse.formats import csr_to_bsr

    csr = poisson3d_csr(4)
    bsr = csr_to_bsr(csr, blocksize=8)
    op = BsrOperator.from_bsr(bsr)
    x = np.random.default_rng(0).standard_normal(csr.shape[0]).astype(
        np.float32
    )
    y = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, csr.matvec(x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(op.diagonal()), 6.0)


def test_cg_solve_accepts_bsr():
    import tpucg
    from tpucg.sparse.formats import csr_to_bsr

    csr = poisson3d_csr(4)
    n = csr.shape[0]
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = csr.matvec(x_true)
    tol = 1e-5 * float(np.linalg.norm(b))
    bsr = csr_to_bsr(csr, blocksize=4)
    r = tpucg.cg_solve(bsr, b, tol=tol, maxiter=10 * n)
    assert bool(r.converged)
    np.testing.assert_allclose(np.asarray(r.x), x_true, atol=1e-3)
