"""Cached spectral-interval reuse for CA-CG and Chebyshev.

The per-solve power-method setup (2 x 12-16 matvecs,
``solver.cg.spectral_interval_estimate``) dominates short CA/Chebyshev
solves (RESULTS.md cadence table). ``interval=(lam_lo, lam_hi)`` — e.g.
from the public ``tpucg.spectral_interval`` — makes the estimate a
reusable artifact: these tests pin that a supplied interval (a) is
actually used (correct solves at the same lap counts), (b) tolerates the
estimate error a cached value carries, and (c) rides the serial, sharded
dense, and sharded operator paths.
"""

import numpy as np
import pytest

import tpucg
from tpucg.solver.operators import PoissonOperator
from tpucg.solver.sharded import sharded_cg_solve, sharded_operator_cg_solve


@pytest.fixture(scope="module")
def system():
    A, b, x0 = tpucg.generate_spd_system(192, seed=3)
    lam_lo, lam_hi, _ = tpucg.spectral_interval(A)
    return A, b, x0, (lam_lo, lam_hi)


@pytest.mark.parametrize("method", ["ca", "chebyshev"])
def test_serial_interval_matches_estimated(system, method):
    A, b, x0, iv = system
    cold = tpucg.cg_solve(A, b, x0, method=method, maxiter=800)
    warm = tpucg.cg_solve(A, b, x0, method=method, maxiter=800, interval=iv)
    assert bool(warm.converged)
    # Same interval (the public API runs the same estimator) -> identical
    # basis scalars -> the lap count cannot degrade.
    assert int(warm.iterations) <= int(cold.iterations)
    np.testing.assert_allclose(
        np.asarray(warm.x), np.asarray(cold.x), rtol=1e-3, atol=1e-5
    )


def test_serial_interval_tolerates_padding(system):
    # A cached interval is an ESTIMATE; both loops pad it. A deliberately
    # widened interval must still converge (CA: conditioning-only; the
    # Chebyshev rate degrades but its chunk guard holds correctness).
    A, b, x0, (lo, hi) = system
    r = tpucg.cg_solve(
        A, b, x0, method="ca", maxiter=800, interval=(0.5 * lo, 1.5 * hi)
    )
    assert bool(r.converged)
    resid = np.linalg.norm(np.asarray(b) - np.asarray(A) @ np.asarray(r.x))
    assert resid < 5e-6


def test_interval_requires_ca_or_chebyshev(system):
    A, b, x0, iv = system
    with pytest.raises(ValueError, match="interval"):
        tpucg.cg_solve(A, b, x0, method="cg", interval=iv)
    with pytest.raises(ValueError, match="interval"):
        sharded_cg_solve(A, b, x0, method="pipelined", interval=iv)


@pytest.mark.parametrize("method", ["ca", "chebyshev"])
def test_sharded_dense_interval(system, method):
    A, b, x0, iv = system
    cold = sharded_cg_solve(A, b, x0, method=method, maxiter=800)
    warm = sharded_cg_solve(
        A, b, x0, method=method, maxiter=800, interval=iv
    )
    assert bool(warm.converged)
    assert int(warm.iterations) <= int(cold.iterations)
    np.testing.assert_allclose(
        np.asarray(warm.x), np.asarray(cold.x), rtol=1e-3, atol=1e-5
    )


@pytest.mark.parametrize("method", ["ca", "chebyshev"])
def test_sharded_operator_interval(method):
    # Slab-decomposed Poisson (the operator arm): the cached interval rides
    # the halo-exchange matvec unchanged.
    op = PoissonOperator(m=12)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(op.n).astype(np.float32)
    lam_lo, lam_hi, _ = tpucg.spectral_interval(op)
    tol = 1e-5 * float(np.linalg.norm(b))
    cold = sharded_operator_cg_solve(
        op, b, method=method, tol=tol, maxiter=4 * op.n
    )
    warm = sharded_operator_cg_solve(
        op, b, method=method, tol=tol, maxiter=4 * op.n,
        interval=(lam_lo, lam_hi),
    )
    assert bool(warm.converged)
    assert int(warm.iterations) <= int(cold.iterations) + 8
    np.testing.assert_allclose(
        np.asarray(warm.x), np.asarray(cold.x), rtol=1e-3, atol=1e-4
    )


def test_interval_2d_mesh_rejected(system):
    A, b, x0, iv = system
    from tpucg.comm.mesh import make_mesh2d

    with pytest.raises(ValueError, match="1-D"):
        sharded_cg_solve(
            A, b, x0, mesh=make_mesh2d(2, 4), method="ca", interval=iv
        )
