"""Multi-RHS block solve tests: k CG recurrences in lockstep under vmap,
one A @ P GEMM per lap (extension beyond the reference's single-RHS
programs)."""

import numpy as np
import pytest

import tpucg
from tpucg.solver.oracle import oracle_cg


def test_multi_matches_per_column_solves():
    n, k = 64, 5
    A, _, _ = tpucg.generate_spd_system(n, seed=0)
    rng = np.random.default_rng(1)
    B = rng.random((n, k)).astype(np.float32)
    res = tpucg.cg_solve_multi(A, B)
    assert res.x.shape == (n, k)
    assert res.iterations.shape == (k,)
    for j in range(k):
        x_ref, k_ref, _ = oracle_cg(A, B[:, j], np.zeros(n, np.float32))
        assert bool(res.converged[j])
        assert abs(int(res.iterations[j]) - k_ref) <= 1
        np.testing.assert_allclose(
            np.asarray(res.x[:, j]), x_ref, rtol=1e-4, atol=1e-6
        )


def test_multi_independent_convergence():
    # Lanes with very different difficulty converge to their own counts.
    n = 48
    A, _, _ = tpucg.generate_spd_system(n, seed=2)
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal((n, 2)).astype(np.float32)
    B = (A @ x_true).astype(np.float32)
    B[:, 1] *= 1e-3  # much smaller RHS: converges in fewer laps at abs tol
    res = tpucg.cg_solve_multi(A, B)
    assert bool(res.converged.all())
    assert int(res.iterations[1]) <= int(res.iterations[0])


def test_multi_padded_and_jacobi():
    n, k = 67, 3
    A, _, _ = tpucg.generate_spd_system(n, seed=4)
    rng = np.random.default_rng(5)
    B = rng.random((n, k)).astype(np.float32)
    res = tpucg.cg_solve_multi(A, B, precondition="jacobi")
    assert res.x.shape == (n, k)
    assert bool(res.converged.all())
    for j in range(k):
        resid = np.linalg.norm(B[:, j] - A @ np.asarray(res.x[:, j]))
        assert resid < 1e-5


def test_multi_rejects_pipelined_and_bad_shapes():
    A, b, _ = tpucg.generate_spd_system(16, seed=0)
    with pytest.raises(ValueError, match="method"):
        tpucg.cg_solve_multi(A, np.ones((16, 2)), method="pipelined")
    with pytest.raises(ValueError, match="shape"):
        tpucg.cg_solve_multi(A, b)  # 1-D B
