"""Jacobi-preconditioned CG tests (extension beyond the reference's
unpreconditioned solver; stopping contract unchanged: sqrt(r.r) < tol on the
TRUE residual, checked after the x/r update)."""

import numpy as np
import pytest

import tpucg
from tpucg.solver.operators import DenseOperator, EllOperator, PoissonOperator
from tpucg.io.generator import poisson3d_csr


def _badly_scaled_system(n=64, seed=2):
    """SPD system whose rows/columns span 4 orders of magnitude — plain CG
    crawls; Jacobi renormalizes it. (Wider spans exceed what float32 can
    solve accurately at all.)"""
    rng = np.random.default_rng(seed)
    R = rng.random((n, n))
    A0 = 0.5 * (R + R.T) + n * np.eye(n)
    d = 10.0 ** rng.uniform(-2, 2, n)
    A = (A0 * d).T * d  # D A0 D, SPD
    x_true = rng.standard_normal(n)
    b = A @ x_true
    return A.astype(np.float32), b.astype(np.float32), x_true


def _rel_residual(A, b, x):
    r = b.astype(np.float64) - A.astype(np.float64) @ np.asarray(x, np.float64)
    return float(np.linalg.norm(r) / np.linalg.norm(b))


def test_jacobi_beats_plain_on_bad_scaling():
    A, b, x_true = _badly_scaled_system()
    n = A.shape[0]
    tol = 1e-5 * float(np.linalg.norm(b))
    plain = tpucg.cg_solve(A, b, tol=tol, maxiter=10 * n)
    jac = tpucg.cg_solve(A, b, tol=tol, maxiter=10 * n,
                         precondition="jacobi")
    assert bool(jac.converged)
    assert int(jac.iterations) < int(plain.iterations)
    # The contract is on the residual; for this conditioning the solution
    # itself is only determined to ~kappa * eps_f32.
    assert _rel_residual(A, b, jac.x) < 1e-4


def test_jacobi_same_solution_as_plain(golden_4x4):
    g = golden_4x4
    r = tpucg.cg_solve(g["A"], g["b"], g["x0"], precondition="jacobi")
    assert bool(r.converged)
    np.testing.assert_allclose(np.asarray(r.x), g["x_star"], atol=1e-4)


def test_jacobi_sharded_matches_serial():
    A, b, x_true = _badly_scaled_system(n=96, seed=5)
    tol = 1e-5 * float(np.linalg.norm(b))
    ser = tpucg.cg_solve(A, b, tol=tol, precondition="jacobi", maxiter=960)
    assert _rel_residual(A, b, ser.x) < 1e-4
    for strategy in ("allgather", "overlap"):
        sh = tpucg.sharded_cg_solve(
            A, b, tol=tol, precondition="jacobi", strategy=strategy,
            maxiter=960,
        )
        assert bool(sh.converged), strategy
        # Different reduction order -> different f32 trajectory; both must
        # satisfy the same residual contract on the true system.
        assert _rel_residual(A, b, sh.x) < 1e-4, strategy


def test_jacobi_checkpointed():
    A, b, _ = _badly_scaled_system(n=48, seed=7)
    tol = 1e-5 * float(np.linalg.norm(b))
    ref = tpucg.cg_solve(A, b, tol=tol, precondition="jacobi", maxiter=480)
    res = tpucg.cg_solve_checkpointed(
        A, b, tol=tol, precondition="jacobi", maxiter=480, segment_iters=5
    )
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


def test_diagonal_ell_and_poisson():
    csr = poisson3d_csr(4)
    op = EllOperator.from_csr(csr)
    np.testing.assert_allclose(np.asarray(op.diagonal()), 6.0)
    pop = PoissonOperator(m=4)
    np.testing.assert_allclose(np.asarray(pop.diagonal()), 6.0)
    A = np.diag([2.0, 5.0, 9.0]).astype(np.float32)
    dop = DenseOperator.create(A)
    np.testing.assert_allclose(np.asarray(dop.diagonal()), [2.0, 5.0, 9.0])


def test_jacobi_on_poisson_operator():
    m = 6
    op = PoissonOperator(m=m)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(m ** 3).astype(np.float32)
    import jax.numpy as jnp

    b = np.asarray(op.matvec(jnp.asarray(x_true)))
    tol = 1e-5 * float(np.linalg.norm(b))
    r = tpucg.cg_solve(op, b, tol=tol, precondition="jacobi", maxiter=2000)
    assert bool(r.converged)
    np.testing.assert_allclose(np.asarray(r.x), x_true, atol=1e-3)


def test_unknown_preconditioner_rejected():
    with pytest.raises(ValueError, match="preconditioner"):
        tpucg.CGConfig(precondition="ilu")
