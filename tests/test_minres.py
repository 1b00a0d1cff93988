"""MINRES tests (solver/minres.py) — symmetric indefinite extension.

CG's alpha = r.r / p.Ap contract requires SPD (the reference would NaN on
an indefinite quadratic form, serialConjugate.c:219-220); MINRES needs
symmetry only.
"""

import numpy as np
import pytest

import tpucg
from tpucg.solver.minres import minres_solve


def _sym_indefinite(n=192, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    half = n // 2
    lam = np.concatenate([
        -(1.0 + rng.uniform(0.0, 1.0, half)),   # negative branch
        1.0 + rng.uniform(0.0, 1.0, n - half),  # positive branch
    ])
    A = (Q * lam) @ Q.T
    return (0.5 * (A + A.T)).astype(np.float32)


class TestMinres:
    def test_indefinite_converges_where_cg_cannot(self):
        A = _sym_indefinite()
        n = A.shape[0]
        b = np.random.default_rng(1).standard_normal(n).astype(np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        res = minres_solve(A, b, tol=tol, maxiter=4 * n)
        assert bool(res.converged)
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-3, atol=1e-3)
        # (CG on indefinite systems is UNGUARANTEED — it may luck into a
        # solution or NaN depending on the spectrum; MINRES is the
        # guaranteed path, which is the point of this module.)

    def test_spd_matches_cg(self):
        A, b, x0 = tpucg.generate_spd_system(128, seed=2)
        A, b, x0 = map(np.asarray, (A, b, x0))
        tol = 1e-5 * float(np.linalg.norm(b))
        r_mr = minres_solve(A, b, x0, tol=tol)
        r_cg = tpucg.cg_solve(A, b, x0, tol=tol)
        assert bool(r_mr.converged)
        np.testing.assert_allclose(np.asarray(r_mr.x), np.asarray(r_cg.x),
                                   rtol=1e-3, atol=1e-4)

    def test_golden_2x2(self):
        from tpucg.io.golden import GOLDEN_2X2

        g = GOLDEN_2X2
        res = minres_solve(g["A"], g["b"], g["x0"])
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), g["x_star"],
                                   atol=1e-5)

    def test_exact_x0_zero_iterations(self):
        A = _sym_indefinite(n=64, seed=3)
        x = np.random.default_rng(4).standard_normal(64).astype(np.float32)
        b = (A @ x).astype(np.float32)
        res = minres_solve(A, b, x, tol=1e-3)
        assert bool(res.converged)
        assert int(res.iterations) == 0

    def test_padding_and_operator_input(self):
        # n=100 pads to 128; also exercise the operator path (Pallas GEMV).
        A = _sym_indefinite(n=100, seed=5)
        b = np.random.default_rng(6).standard_normal(100).astype(np.float32)
        tol = 1e-4 * float(np.linalg.norm(b))
        res = minres_solve(A, b, tol=tol, maxiter=800, kernel="pallas")
        assert bool(res.converged)
        assert res.x.shape == (100,)
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-2, atol=1e-2)

    def test_sharded_parity_both_strategies(self):
        # 8-device CPU mesh: row-sharded matvec + psum dots, same loop.
        A = _sym_indefinite(n=256, seed=9)
        b = np.random.default_rng(10).standard_normal(256).astype(np.float32)
        tol = 1e-4 * float(np.linalg.norm(b))
        ser = minres_solve(A, b, tol=tol, maxiter=1024)
        assert bool(ser.converged)
        for strategy in ("allgather", "overlap"):
            sh = tpucg.sharded_minres_solve(A, b, tol=tol, maxiter=1024,
                                            strategy=strategy)
            assert bool(sh.converged), strategy
            assert abs(int(sh.iterations) - int(ser.iterations)) <= 2
            np.testing.assert_allclose(np.asarray(sh.x), np.asarray(ser.x),
                                       rtol=1e-2, atol=1e-3)

    def test_sharded_nondivisible_pads(self):
        A = _sym_indefinite(n=100, seed=11)
        b = np.random.default_rng(12).standard_normal(100).astype(np.float32)
        tol = 1e-4 * float(np.linalg.norm(b))
        res = tpucg.sharded_minres_solve(A, b, tol=tol, maxiter=800)
        assert bool(res.converged)
        assert res.x.shape == (100,)
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-2, atol=1e-2)

    def test_maxiter_cap_and_guards(self):
        A = _sym_indefinite(n=96, seed=7)
        b = np.random.default_rng(8).standard_normal(96).astype(np.float32)
        res = minres_solve(A, b, tol=1e-30, maxiter=5)
        assert int(res.iterations) == 5 and not bool(res.converged)
        with pytest.raises(ValueError, match="unpreconditioned"):
            minres_solve(A, b, precondition="jacobi")
        with pytest.raises(ValueError, match="method"):
            minres_solve(A, b, method="pipelined")
