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
    np.testing.assert_allclose(ell.to_dense_check(csr), 0.0) if hasattr(
        ell, "to_dense_check"
    ) else None
    # padded entries are zero-valued at column 0
    x = np.arange(csr.shape[0], dtype=np.float32)
    y_ell = (ell.values * x[ell.indices]).sum(axis=1)
    np.testing.assert_allclose(y_ell, csr.matvec(x), rtol=1e-5, atol=1e-5)
