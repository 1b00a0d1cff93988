"""2-D block decomposition tests (SUMMA-style GEMV over a (R x C) mesh).

An extension beyond the reference's 1-D row striping (SURVEY.md §2.4 lists
2-D blocking as the idiomatic improvement): per-lap comm is O(n/C) allgather
within mesh columns + O(n/R) reduce-scatter within mesh rows instead of the
1-D O(n) allgather."""

import numpy as np
import pytest

import tpucg
from tpucg.comm.mesh import make_mesh2d
from tpucg.solver.oracle import oracle_cg
from tpucg.solver.sharded import _colperm_2d


def test_colperm_is_permutation():
    perm = _colperm_2d(48, 2, 4)
    assert sorted(perm.tolist()) == list(range(48))
    # device (i, j) gathers chunks (0..R-1, j): block j of the permuted order.
    cs = 48 // 8
    block_j0 = perm[: 2 * cs]
    np.testing.assert_array_equal(
        block_j0,
        np.concatenate([np.arange(0, cs), np.arange(4 * cs, 5 * cs)]),
    )


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (2, 2)])
def test_2d_matches_oracle(shape):
    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=1)
    x_ref, k_ref, _ = oracle_cg(A, b, x0)
    mesh = make_mesh2d(*shape)
    r = tpucg.sharded_cg_solve(A, b, x0, mesh=mesh)
    assert bool(r.converged)
    assert abs(int(r.iterations) - k_ref) <= 1
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-6)


def test_2d_padded_uneven():
    n = 67  # forces identity-tail padding for any 2-D shape
    A, b, x0 = tpucg.generate_spd_system(n, seed=3)
    x_ref, _, _ = oracle_cg(A, b, x0)
    r = tpucg.sharded_cg_solve(A, b, x0, mesh=make_mesh2d(2, 4))
    assert bool(r.converged)
    assert np.asarray(r.x).shape == (n,)
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-6)


def test_2d_pipelined():
    n = 128
    A, b, x0 = tpucg.generate_spd_system(n, seed=2)
    tol = 1e-5 * float(np.linalg.norm(b))
    x_ref, k_ref, _ = oracle_cg(A, b, x0, tol=tol)
    r = tpucg.sharded_cg_solve(
        A, b, x0, mesh=make_mesh2d(2, 4), method="pipelined", tol=tol
    )
    assert bool(r.converged)
    assert abs(int(r.iterations) - k_ref) <= 1
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-5)


def test_2d_golden(golden_4x4):
    g = golden_4x4
    r = tpucg.sharded_cg_solve(g["A"], g["b"], g["x0"], mesh=make_mesh2d(2, 2))
    assert bool(r.converged)
    assert int(r.iterations) == g["iters"]
    np.testing.assert_allclose(np.asarray(r.x), g["x_star"], atol=2e-3)


def test_2d_jacobi_matches_serial():
    # Badly diag-scaled system: Jacobi must help on the 2-D path exactly as
    # it does serially.
    n = 96
    rng = np.random.default_rng(6)
    R = rng.random((n, n))
    A0 = 0.5 * (R + R.T) + n * np.eye(n)
    d = 10.0 ** rng.uniform(-2, 2, n)
    A = ((A0 * d).T * d).astype(np.float32)
    x_true = rng.standard_normal(n)
    b = (A @ x_true).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    ser = tpucg.cg_solve(A, b, tol=tol, precondition="jacobi", maxiter=960)
    sh = tpucg.sharded_cg_solve(
        A, b, mesh=make_mesh2d(2, 4), precondition="jacobi",
        tol=tol, maxiter=960,
    )
    assert bool(sh.converged)
    assert abs(int(sh.iterations) - int(ser.iterations)) <= 2
    r = b.astype(np.float64) - A.astype(np.float64) @ np.asarray(
        sh.x, np.float64
    )
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-4


def test_sharded2d_record_residuals():
    """The ||r|| trace also composes with the 2-D SUMMA decomposition."""
    import tpucg
    from tpucg import make_mesh2d

    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=19)
    A = (A - (n - n / 8.0) * np.eye(n)).astype(np.float32)
    ser = tpucg.cg_solve(A, b, x0, record_residuals=True)
    sh = tpucg.sharded_cg_solve(
        A, b, x0, mesh=make_mesh2d(2, 4), record_residuals=True
    )
    assert sh.residual_history is not None
    k = int(sh.iterations)
    assert int(ser.iterations) == k
    h = np.asarray(sh.residual_history)
    assert np.all(np.isfinite(h[: k + 1]))
    assert h[k] < 1.0e-6
    assert np.all(np.isnan(h[k + 1:]))


class Test2DRightEdge:
    """MINRES, deflation, and bf16 storage on the 2-D SUMMA mesh — the
    right-edge column of the README solver matrix."""

    def test_minres_2d_indefinite(self):
        import jax.numpy as jnp

        n = 192
        rng = np.random.default_rng(70)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.concatenate([-(1 + rng.uniform(0, 1, n // 2)),
                              1 + rng.uniform(0, 1, n - n // 2)])
        A = ((Q * lam) @ Q.T).astype(np.float32)
        A = 0.5 * (A + A.T)
        b = rng.standard_normal(n).astype(np.float32)
        tol = 1e-4 * float(np.linalg.norm(b))
        mesh2 = make_mesh2d(2, 4)
        r = tpucg.sharded_minres_solve(A, b, mesh=mesh2, tol=tol,
                                       maxiter=4 * n)
        assert bool(r.converged)
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(r.x), x_ref,
                                   rtol=5e-3, atol=5e-3)
        rj = tpucg.sharded_minres_solve(A, b, mesh=mesh2, tol=tol,
                                        maxiter=8 * n,
                                        precondition="jacobi")
        assert bool(rj.converged)
        with pytest.raises(ValueError, match="block_jacobi"):
            tpucg.sharded_minres_solve(A, b, mesh=mesh2,
                                       precondition="block_jacobi")

    def test_deflated_2d_parity_and_warm_start(self):
        A, b, _ = tpucg.generate_spd_system(200, seed=71)
        A, b = np.asarray(A), np.asarray(b)
        tol = 1e-5 * float(np.linalg.norm(b))
        mesh2 = make_mesh2d(2, 4)
        plain = tpucg.sharded_cg_solve(A, b, mesh=mesh2, tol=tol)
        defl = tpucg.sharded_cg_solve_deflated(A, b, np.asarray(plain.x),
                                               mesh=mesh2, tol=tol)
        assert bool(defl.converged) and int(defl.iterations) <= 2
        V = np.random.default_rng(72).standard_normal((200, 3)).astype(
            np.float32)
        d2 = tpucg.sharded_cg_solve_deflated(A, b, V, mesh=mesh2, tol=tol,
                                             precondition="jacobi")
        ser = tpucg.cg_solve_deflated(A, b, V, tol=tol,
                                      precondition="jacobi")
        assert bool(d2.converged)
        assert abs(int(d2.iterations) - int(ser.iterations)) <= 2
        np.testing.assert_allclose(np.asarray(d2.x), np.asarray(ser.x),
                                   rtol=5e-3, atol=5e-3)

    def test_bf16_storage_2d(self):
        import jax.numpy as jnp

        A, b, _ = tpucg.generate_spd_system(200, seed=73)
        A, b = np.asarray(A), np.asarray(b)
        tol = 1e-4 * float(np.linalg.norm(b))
        mesh2 = make_mesh2d(2, 4)
        r16 = tpucg.sharded_cg_solve(A, b, mesh=mesh2, tol=tol,
                                     storage_dtype=jnp.bfloat16)
        r32 = tpucg.sharded_cg_solve(A, b, mesh=mesh2, tol=tol)
        assert bool(r16.converged)
        np.testing.assert_allclose(np.asarray(r16.x), np.asarray(r32.x),
                                   rtol=1e-2, atol=1e-2)

    def test_multi_and_block_2d(self):
        A, b, _ = tpucg.generate_spd_system(200, seed=80)
        A = np.asarray(A)
        B = np.random.default_rng(81).standard_normal((200, 3)).astype(
            np.float32)
        mesh2 = make_mesh2d(2, 4)
        rm = tpucg.sharded_cg_solve_multi(A, B, mesh=mesh2, tol=1e-5)
        rb = tpucg.sharded_cg_solve_block(A, B, mesh=mesh2, tol=1e-5,
                                          precondition="jacobi")
        rp = tpucg.sharded_cg_solve_block(A, B, mesh=mesh2, tol=1e-5,
                                          precondition="poly",
                                          poly_degree=2)
        assert np.asarray(rm.converged).all()
        assert np.asarray(rb.converged).all()
        assert np.asarray(rp.converged).all()
        for j in range(3):
            ser = tpucg.cg_solve(A, B[:, j], tol=1e-5)
            assert int(np.asarray(rm.iterations)[j]) == int(ser.iterations)
            np.testing.assert_allclose(np.asarray(rm.x)[:, j],
                                       np.asarray(ser.x),
                                       rtol=5e-3, atol=5e-3)
            np.testing.assert_allclose(np.asarray(rb.x)[:, j],
                                       np.asarray(ser.x),
                                       rtol=5e-3, atol=5e-3)
        with pytest.raises(ValueError, match="block Jacobi"):
            tpucg.sharded_cg_solve_block(A, B, mesh=mesh2,
                                         precondition="block_jacobi")
