"""Property-style randomized tests (SURVEY.md §4.3: "property tests on random
diag-dominant SPD matrices"): across seeds and sizes, every solver variant
must satisfy the residual contract and agree with the NumPy oracle."""

import numpy as np
import pytest

import tpucg
from tpucg.solver.oracle import oracle_cg


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [16, 33, 100])
def test_cg_matches_oracle_random(seed, n):
    A, b, x0 = tpucg.generate_spd_system(n, seed=seed)
    x_ref, k_ref, rn_ref = oracle_cg(A, b, x0)
    r = tpucg.cg_solve(A, b, x0)
    assert bool(r.converged)
    assert abs(int(r.iterations) - k_ref) <= 1
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-6)
    # Contract: the reported residual norm is below tol.
    assert float(r.residual_norm) < 1.0e-6


@pytest.mark.parametrize("seed", [0, 5])
def test_random_x0_and_solution_recovery(seed):
    n = 64
    A, b, _ = tpucg.generate_spd_system(n, seed=seed, x0="random")
    rng = np.random.default_rng(seed + 100)
    x0 = rng.standard_normal(n).astype(np.float32)
    x_ref, _, _ = oracle_cg(A, b, x0)
    r = tpucg.cg_solve(A, b, x0)
    assert bool(r.converged)
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-6)
    # True residual: the recurrence-maintained r drifts from b - Ax by
    # O(eps_f32 * ||A|| * ||x||) — the same bound the reference's float32
    # recurrence obeys — so test against a drift-aware threshold, not tol.
    resid = np.linalg.norm(b - A @ np.asarray(r.x))
    eps = float(np.finfo(np.float32).eps)
    drift = 20 * eps * np.linalg.norm(A, 1) * (
        np.linalg.norm(x0) + np.linalg.norm(x_ref)
    )
    assert resid < 1e-6 + drift


@pytest.mark.parametrize("seed", [0, 7])
@pytest.mark.parametrize("strategy", ["allgather", "overlap"])
def test_sharded_agrees_with_serial_random(seed, strategy):
    n = 72  # not divisible by 8: exercises padding every time
    A, b, x0 = tpucg.generate_spd_system(n, seed=seed)
    ser = tpucg.cg_solve(A, b, x0)
    sh = tpucg.sharded_cg_solve(A, b, x0, strategy=strategy)
    assert bool(sh.converged)
    assert abs(int(sh.iterations) - int(ser.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(ser.x), rtol=1e-4, atol=1e-6
    )


def test_symmetric_permutation_invariance():
    # CG on a symmetrically permuted system solves the permuted solution.
    n = 48
    A, b, x0 = tpucg.generate_spd_system(n, seed=9)
    perm = np.random.default_rng(0).permutation(n)
    r1 = tpucg.cg_solve(A, b, x0)
    r2 = tpucg.cg_solve(A[perm][:, perm], b[perm], x0[perm])
    assert bool(r2.converged)
    np.testing.assert_allclose(
        np.asarray(r2.x), np.asarray(r1.x)[perm], rtol=1e-4, atol=1e-5
    )


def test_scaled_system_scaled_solution():
    # A x = b  =>  (cA) x = (cb): same x, scale-equivariant pipeline.
    n = 40
    A, b, x0 = tpucg.generate_spd_system(n, seed=11)
    r1 = tpucg.cg_solve(A, b, x0, tol=1e-6)
    c = 8.0
    r2 = tpucg.cg_solve(c * A, c * b, x0, tol=8e-6)
    assert bool(r2.converged)
    np.testing.assert_allclose(
        np.asarray(r2.x), np.asarray(r1.x), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("method", ["chebyshev", "block"])
def test_new_solver_arms_match_oracle_random(seed, method):
    # Every solver arm must recover the oracle solution across random
    # diag-dominant systems (SURVEY.md §4.3) — extended to the round-2
    # additions. Chebyshev's lap counts are cadence-rounded and
    # non-minimizing, block CG's are shared; only the solution and the
    # converged flag are oracle-comparable.
    n = 100
    A, b, x0 = tpucg.generate_spd_system(n, seed=seed)
    x_ref, _, _ = oracle_cg(A, b, x0)
    if method == "chebyshev":
        r = tpucg.cg_solve(A, b, x0, method="chebyshev", maxiter=64 * n)
        assert bool(r.converged)
        x = np.asarray(r.x)
    else:
        r = tpucg.cg_solve_block(
            np.asarray(A), np.asarray(b)[:, None],
            np.asarray(x0)[:, None],
        )
        assert np.asarray(r.converged).all()
        x = np.asarray(r.x)[:, 0]
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize(
    "pc", ["block_jacobi", "block_cg_jacobi", "block_cg_block_jacobi"]
)
def test_preconditioned_arms_match_oracle_random(seed, pc):
    # Round-2-late preconditioner fuzz: random banded SPD systems with
    # random log-uniform row/col scaling, random (non-dividing) sizes.
    # Every arm must recover the oracle solution; preconditioned arms
    # must never need MORE laps than their unpreconditioned sibling on
    # the same system (equilibration can only help a scaled system).
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(90, 180))
    shift = float(rng.uniform(2.05, 3.0))
    band = (
        shift * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    )
    d = np.exp(rng.uniform(0.0, np.log(20.0), n))
    A = (band * d[:, None] * d[None, :]).astype(np.float32)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = (A.astype(np.float64) @ x_true).astype(np.float32)
    sc = 1.0 / np.sqrt(np.diag(A))
    if pc == "block_jacobi":
        tol = 1e-5 * float(np.linalg.norm(b))
        r = tpucg.cg_solve(A, b, tol=tol, maxiter=8 * n,
                           precondition="block_jacobi", pc_block_size=32)
        plain = tpucg.cg_solve(A, b, tol=tol, maxiter=8 * n)
        assert bool(r.converged), (seed, n)
        assert int(r.iterations) <= int(plain.iterations)
        x = np.asarray(r.x)
    else:
        kind = "jacobi" if pc == "block_cg_jacobi" else "block_jacobi"
        tol = 1e-4 * float(np.linalg.norm(sc * b))
        r = tpucg.cg_solve_block(
            A, b[:, None], tol=tol, maxiter=8 * n,
            precondition=kind, pc_block_size=32,
        )
        assert np.asarray(r.converged).all(), (seed, n)
        x = np.asarray(r.x)[:, 0]
        wres = np.linalg.norm(sc * (b - A @ x))
        assert wres < 5 * tol, (seed, n, wres)
    np.testing.assert_allclose(x, x_true, rtol=2e-2, atol=2e-2)
