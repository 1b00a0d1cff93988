"""Deflated / recycling CG tests (solver/deflation.py).

The reference solves one system per process; these cover the sequence
use case: deflating known slow eigenvectors and recycling previous
solutions across right-hand sides.
"""

import numpy as np
import pytest

import tpucg
from tpucg.solver.oracle import oracle_cg


def _clustered_spd(n=256, n_small=3, seed=0):
    """SPD with n_small tiny eigenvalues (0.01..) and the rest in [1, 2]:
    plain CG stalls on the small cluster; deflating it restores the
    well-conditioned rate. Returns (A, low_eigenvectors)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([
        0.01 * (1.0 + np.arange(n_small)),
        1.0 + rng.uniform(0.0, 1.0, n - n_small),
    ])
    A = (Q * lam) @ Q.T
    return (0.5 * (A + A.T)).astype(np.float32), Q[:, :n_small].astype(
        np.float32)


class TestDeflatedCG:
    def test_eigen_deflation_cuts_iterations(self):
        A, V = _clustered_spd()
        n = A.shape[0]
        rng = np.random.default_rng(1)
        b = rng.standard_normal(n).astype(np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        plain = tpucg.cg_solve(A, b, tol=tol, maxiter=4 * n)
        defl = tpucg.cg_solve_deflated(A, b, V, tol=tol, maxiter=4 * n)
        assert bool(defl.converged)
        # Deflating the 3 small eigenvalues restores the [1,2]-spectrum
        # rate: a large, not marginal, win.
        assert int(defl.iterations) * 2 < int(plain.iterations), (
            int(defl.iterations), int(plain.iterations))
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        err = np.max(np.abs(np.asarray(defl.x) - x_ref))
        assert err < 1e-2 * np.max(np.abs(x_ref))

    def test_random_subspace_is_harmless(self):
        # A random deflation space gives no rate win but must not break
        # correctness (solution parity with the oracle).
        A, b, x0 = tpucg.generate_spd_system(192, seed=3)
        A, b, x0 = map(np.asarray, (A, b, x0))
        V = np.random.default_rng(4).standard_normal((192, 5)).astype(
            np.float32)
        res = tpucg.cg_solve_deflated(A, b, V, x0=x0)
        assert bool(res.converged)
        x_ref, k_ref, _ = oracle_cg(A, b, x0, tol=1e-6)
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-3, atol=1e-4)

    def test_single_vector_and_padding(self):
        # n=100 pads to 128; a 1-column V exercises the m=1 small algebra.
        A, b, _ = tpucg.generate_spd_system(100, seed=5)
        A, b = np.asarray(A), np.asarray(b)
        V = np.ones(100, np.float32)  # 1-D accepted as one column
        res = tpucg.cg_solve_deflated(A, b, V)
        assert bool(res.converged)
        x_ref, _, _ = oracle_cg(A, b, np.zeros(100, np.float32), tol=1e-6)
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-3, atol=1e-4)

    def test_rank_deficient_subspace(self):
        # Duplicated columns: the equilibrated CholeskyQR2 must not NaN.
        A, b, _ = tpucg.generate_spd_system(128, seed=6)
        A, b = np.asarray(A), np.asarray(b)
        v = np.random.default_rng(7).standard_normal(128).astype(np.float32)
        V = np.stack([v, v, 2 * v], axis=1)
        basis = tpucg.build_deflation_basis(A, V)
        assert basis.m == 1  # rank-revealing prune
        res = tpucg.cg_solve_deflated(A, b, basis=basis)
        assert bool(res.converged)
        assert np.isfinite(np.asarray(res.x)).all()

    def test_composes_with_jacobi(self):
        A, Vlow = _clustered_spd(n=192, seed=8)
        d = np.exp(np.random.default_rng(9).uniform(0, np.log(30), 192))
        Ascaled = (A * d[:, None] * d[None, :]).astype(np.float32)
        b = np.random.default_rng(10).standard_normal(192).astype(np.float32)
        tol = 1e-4 * float(np.linalg.norm(b / np.sqrt(np.diag(Ascaled))))
        res = tpucg.cg_solve_deflated(
            Ascaled, b, (Vlow / d[:, None]).astype(np.float32),
            tol=tol, maxiter=4 * 192, precondition="jacobi",
        )
        assert bool(res.converged)
        resid = np.linalg.norm(b - Ascaled @ np.asarray(res.x))
        assert resid < 10 * tol

    def test_prebuilt_basis_reuse_and_validation(self):
        A, V = _clustered_spd(n=128, seed=11)
        basis = tpucg.build_deflation_basis(A, V)
        b1 = np.random.default_rng(12).standard_normal(128).astype(np.float32)
        b2 = np.random.default_rng(13).standard_normal(128).astype(np.float32)
        # f32 deflation noise floors the attainable absolute residual near
        # eps*||A||*||x||; use a relative tolerance like production callers.
        tol1 = 1e-5 * float(np.linalg.norm(b1))
        r1 = tpucg.cg_solve_deflated(A, b1, basis=basis, tol=tol1)
        r2 = tpucg.cg_solve_deflated(
            A, b2, basis=basis, tol=1e-5 * float(np.linalg.norm(b2)))
        assert bool(r1.converged) and bool(r2.converged)
        with pytest.raises(ValueError, match="exactly one"):
            tpucg.cg_solve_deflated(A, b1, V, basis=basis)
        with pytest.raises(ValueError, match="exactly one"):
            tpucg.cg_solve_deflated(A, b1)
        with pytest.raises(ValueError, match="method"):
            tpucg.cg_solve_deflated(A, b1, V, method="pipelined")

    def test_galerkin_warm_start_exact_subspace(self):
        # If b lies in span(A W), the Galerkin projection alone solves the
        # system: 0 iterations.
        A, _ = _clustered_spd(n=128, seed=14)
        W = np.random.default_rng(15).standard_normal((128, 4)).astype(
            np.float32)
        y = np.random.default_rng(16).standard_normal(4).astype(np.float32)
        b = (A @ W @ y).astype(np.float32)
        res = tpucg.cg_solve_deflated(A, b, W, tol=1e-4)
        assert bool(res.converged)
        assert int(res.iterations) == 0


class TestShardedDeflatedCG:
    """8-device CPU mesh (conftest): W/AW row-sharded, Ginv replicated,
    one extra m-length psum per lap."""

    def test_parity_with_serial_both_strategies(self):
        A, V = _clustered_spd(n=256, seed=30)
        b = np.random.default_rng(31).standard_normal(256).astype(np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        ser = tpucg.cg_solve_deflated(A, b, V, tol=tol, maxiter=1024)
        assert bool(ser.converged)
        for strategy in ("allgather", "overlap"):
            sh = tpucg.sharded_cg_solve_deflated(
                A, b, V, tol=tol, maxiter=1024, strategy=strategy)
            assert bool(sh.converged), strategy
            assert abs(int(sh.iterations) - int(ser.iterations)) <= 2, (
                strategy, int(sh.iterations), int(ser.iterations))
            np.testing.assert_allclose(np.asarray(sh.x), np.asarray(ser.x),
                                       rtol=1e-2, atol=1e-3)

    def test_nondivisible_n_pads(self):
        # n=100 is not divisible by 8 devices: identity-tail padding.
        A, b, _ = tpucg.generate_spd_system(100, seed=32)
        A, b = np.asarray(A), np.asarray(b)
        V = np.random.default_rng(33).standard_normal((100, 3)).astype(
            np.float32)
        res = tpucg.sharded_cg_solve_deflated(A, b, V)
        assert bool(res.converged)
        assert res.x.shape == (100,)
        x_ref, _, _ = oracle_cg(A, b, np.zeros(100, np.float32), tol=1e-6)
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-3, atol=1e-4)

    def test_composes_with_jacobi(self):
        A, Vlow = _clustered_spd(n=192, seed=34)
        d = np.exp(np.random.default_rng(35).uniform(0, np.log(10), 192))
        Ascaled = (A * d[:, None] * d[None, :]).astype(np.float32)
        b = np.random.default_rng(36).standard_normal(192).astype(np.float32)
        tol = 1e-4 * float(np.linalg.norm(b / np.sqrt(np.diag(Ascaled))))
        res = tpucg.sharded_cg_solve_deflated(
            Ascaled, b, (Vlow / d[:, None]).astype(np.float32),
            tol=tol, maxiter=768, precondition="jacobi",
        )
        assert bool(res.converged)
        resid = np.linalg.norm(b - Ascaled @ np.asarray(res.x))
        assert resid < 10 * tol

    def test_method_guard(self):
        A, b, _ = tpucg.generate_spd_system(64, seed=37)
        with pytest.raises(ValueError, match="method"):
            tpucg.sharded_cg_solve_deflated(
                np.asarray(A), np.asarray(b),
                np.ones((64, 1), np.float32), method="pipelined")


class TestCLIDeflate:
    def test_solve_with_deflate_flag(self, tmp_path, capsys):
        from tpucg.cli import main
        from tpucg.io.textio import save_array

        A, V = _clustered_spd(n=64, seed=40)
        b = np.random.default_rng(41).standard_normal(64).astype(np.float32)
        pa, pb, pv = (str(tmp_path / f) for f in ("A.txt", "b.txt", "V.npy"))
        save_array(pa, A, fmt="%r")
        save_array(pb, b, fmt="%r")
        np.save(pv, V)
        tol = 1e-5 * float(np.linalg.norm(b))
        rc = main(["solve", pa, pb, "--deflate", pv, "--tol", str(tol)])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "deflated m=3" in out
        assert "converged            : True" in out
        # sharded strategy routes through sharded_cg_solve_deflated
        rc = main(["solve", pa, pb, "--deflate", pv, "--tol", str(tol),
                   "--strategy", "allgather"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "converged            : True" in out

    def test_deflate_rejects_mtx_operator(self, tmp_path):
        from tpucg.cli import main
        from tpucg.io.mmio import save_matrix_market

        csr = tpucg.poisson3d_csr(2)
        pa = str(tmp_path / "A.mtx")
        pb = str(tmp_path / "b.mtx")
        save_matrix_market(pa, csr.to_coo(), symmetric=True)
        save_matrix_market(pb, np.ones(csr.shape[0], np.float32))
        with pytest.raises(SystemExit, match="deflate"):
            main(["solve", pa, pb, "--deflate", pb])


class TestRecyclingCG:
    def test_sequence_iterations_drop(self):
        A, _ = _clustered_spd(n=192, n_small=4, seed=20)
        rng = np.random.default_rng(21)
        base = rng.standard_normal(192).astype(np.float32)
        drift = rng.standard_normal(192).astype(np.float32)
        rec = tpucg.RecyclingCG(A, max_vectors=4, tol=1e-4, maxiter=768)
        iters = []
        for t in range(5):
            b = base + 0.1 * t * drift
            res = rec.solve(b)
            assert bool(res.converged)
            resid = np.linalg.norm(b - A @ np.asarray(res.x))
            assert resid < 1e-3, (t, resid)
            iters.append(int(res.iterations))
        # Later solves recycle the sequence's shared content.
        assert min(iters[1:]) * 2 < iters[0], iters

    def test_fifo_cap(self):
        A, b, _ = tpucg.generate_spd_system(96, seed=22)
        A = np.asarray(A)
        rec = tpucg.RecyclingCG(A, max_vectors=2)
        rng = np.random.default_rng(23)
        for _ in range(4):
            res = rec.solve(rng.standard_normal(96).astype(np.float32))
            assert bool(res.converged)
        assert rec._basis is not None and rec._basis.m == 2


class TestOperatorShardedDeflatedCG:
    """Operator decompositions (slab/band-halo/allgather) x deflation —
    the right-edge column of the README solver matrix."""

    def test_poisson_slab_exact_subspace(self):
        # Deflating with the exact solution makes the Galerkin warm start
        # land on x*, so the solve needs ~0 laps.
        from tpucg.solver.operators import PoissonOperator

        m = 8
        n = m ** 3
        op = PoissonOperator(m=m)
        b = np.random.default_rng(30).standard_normal(n).astype(np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        plain = tpucg.sharded_operator_cg_solve(op, b, tol=tol)
        assert bool(plain.converged)
        defl = tpucg.sharded_cg_solve_deflated(
            op, b, np.asarray(plain.x), tol=tol)
        assert bool(defl.converged)
        assert int(defl.iterations) <= 2, int(defl.iterations)
        np.testing.assert_allclose(np.asarray(defl.x), np.asarray(plain.x),
                                   rtol=5e-3, atol=5e-3)

    def test_dia_band_halo_parity_with_serial(self):
        from tpucg.io.generator import poisson3d_dia
        from tpucg.solver.operators import DiaOperator

        m = 8
        n = m ** 3
        dia = poisson3d_dia(m)
        op = DiaOperator.from_dia(dia)
        rng = np.random.default_rng(31)
        b = rng.standard_normal(n).astype(np.float32)
        V = rng.standard_normal((n, 3)).astype(np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        ser = tpucg.cg_solve_deflated(op, b, V, tol=tol,
                                      precondition="jacobi")
        sh = tpucg.sharded_cg_solve_deflated(op, b, V, tol=tol,
                                             precondition="jacobi")
        assert bool(ser.converged) and bool(sh.converged)
        np.testing.assert_allclose(np.asarray(sh.x), np.asarray(ser.x),
                                   rtol=5e-3, atol=5e-3)
        # Same Krylov trajectory => closely tracking lap counts.
        assert abs(int(sh.iterations) - int(ser.iterations)) <= 3

    def test_ell_arm_and_block_jacobi_guard(self):
        from tpucg.solver.operators import EllOperator

        m = 8
        n = m ** 3
        ell = EllOperator.from_csr(tpucg.poisson3d_csr(m))
        rng = np.random.default_rng(32)
        b = rng.standard_normal(n).astype(np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        plain = tpucg.sharded_operator_cg_solve(ell, b, tol=tol)
        defl = tpucg.sharded_cg_solve_deflated(
            ell, b, np.asarray(plain.x), tol=tol)
        assert bool(defl.converged)
        assert int(defl.iterations) <= 2
        with pytest.raises(ValueError, match="block Jacobi"):
            tpucg.sharded_cg_solve_deflated(
                ell, b, np.asarray(plain.x), precondition="block_jacobi")

    def test_recycling_sharded_poisson_sequence(self):
        # RecyclingCG(mesh=...) rides the operator decomposition; a smooth
        # RHS sequence shows the recycling payoff distributed.
        from tpucg.comm.mesh import make_mesh
        from tpucg.solver.operators import PoissonOperator

        m = 8
        n = m ** 3
        op = PoissonOperator(m=m)
        rng = np.random.default_rng(33)
        base = rng.standard_normal(n).astype(np.float32)
        drift = rng.standard_normal(n).astype(np.float32)
        rec = tpucg.RecyclingCG(op, max_vectors=4, mesh=make_mesh(),
                                tol=1e-4, maxiter=4 * n)
        iters = []
        for t in range(4):
            b = base + 0.05 * t * drift
            res = rec.solve(b)
            assert bool(res.converged)
            iters.append(int(res.iterations))
        assert min(iters[1:]) * 2 < iters[0], iters


def test_basis_is_a_orthonormal():
    """build_deflation_basis folds G^-1/2 in f64: W^T A W = I to ~f32
    accuracy and Ginv is the identity, even for a near-degenerate
    solution-type stack (the recycled-sequence shape whose explicit
    f32 Ginv used to carry kappa(A)-scale entries)."""
    A, b, _ = tpucg.generate_spd_system(256, seed=20)
    A = np.asarray(A)
    x = np.linalg.solve(A.astype(np.float64), np.asarray(b, np.float64))
    V = np.stack(
        [x, x * (1 + 1e-3 * np.random.default_rng(21).standard_normal(256))],
        axis=1,
    ).astype(np.float32)
    basis = tpucg.build_deflation_basis(A, V)
    W = np.asarray(basis.W, np.float64)
    G = W.T @ (A.astype(np.float64) @ W)
    np.testing.assert_allclose(G, np.eye(basis.m), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(basis.Ginv),
                                  np.eye(basis.m, dtype=np.float32))


def test_recycling_state_roundtrip(tmp_path):
    """A sequence interrupted by save/load must continue with the same
    lap counts as the uninterrupted run — the time-stepping restart
    story (sequence-level analog of checkpoint/resume)."""
    A, V = _clustered_spd(n=256, seed=30)
    rng = np.random.default_rng(31)
    base = rng.standard_normal(256).astype(np.float32)
    drift = rng.standard_normal(256).astype(np.float32)
    tol = 1e-4 * float(np.linalg.norm(base))
    path = str(tmp_path / "rec_state.npz")

    def rhs(t):
        return base + 0.1 * t * drift

    ref = tpucg.RecyclingCG(A, max_vectors=3, tol=tol, maxiter=1024)
    ref_laps = [int(ref.solve(rhs(t)).iterations) for t in range(5)]

    first = tpucg.RecyclingCG(A, max_vectors=3, tol=tol, maxiter=1024)
    for t in range(3):
        first.solve(rhs(t))
    first.save_state(path)

    resumed = tpucg.RecyclingCG(A, max_vectors=3, tol=tol, maxiter=1024)
    m = resumed.load_state(path)
    assert m == 3
    for t in (3, 4):
        r = resumed.solve(rhs(t))
        assert bool(r.converged)
        assert abs(int(r.iterations) - ref_laps[t]) <= 2, (
            t, int(r.iterations), ref_laps)


def test_recycling_state_refuses_foreign_operator(tmp_path):
    A1, _ = _clustered_spd(n=128, seed=32)
    A2, _ = _clustered_spd(n=128, seed=33)
    b = np.random.default_rng(34).standard_normal(128).astype(np.float32)
    tol = 1e-4 * float(np.linalg.norm(b))
    path = str(tmp_path / "rec_state.npz")
    rec1 = tpucg.RecyclingCG(A1, max_vectors=2, tol=tol, maxiter=1024)
    rec1.solve(b)
    rec1.save_state(path)
    rec2 = tpucg.RecyclingCG(A2, max_vectors=2, tol=tol, maxiter=1024)
    with pytest.raises(ValueError, match="DIFFERENT operator"):
        rec2.load_state(path)


def test_recycling_sequence_interrupted_resumes_warm(tmp_path):
    """The round-5 composition (VERDICT r4 #4): a recycled FEM sequence
    killed MID-SOLVE resumes warm — save_state restores the deflation
    stack, the .npz checkpoint the in-flight solve's trajectory, and the
    resumed sequence is bit-identical to the uninterrupted one."""
    import os

    from tpucg.io.generator import fem_p1_system

    A, b0, _ = fem_p1_system(4_000, seed=3)
    n = A.shape[0]
    op = tpucg.best_sparse_operator(A)
    tl = tpucg.build_two_level(A, agg_size=32, npad=op.padded_n)
    rng = np.random.default_rng(11)
    rhs = [b0.astype(np.float32)]
    for _ in range(2):
        rhs.append(
            (rhs[-1] + 0.05 * rng.standard_normal(n)).astype(np.float32)
        )
    # comfortably above the n=4k FEM composed TRUE floor (this test pins
    # resume FIDELITY, not depth)
    tol = 5e-3 * float(np.linalg.norm(b0))
    kw = dict(max_vectors=4, tol=tol, maxiter=4 * n, two_level=tl)

    # Uninterrupted reference sequence.
    ref = tpucg.RecyclingCG(op, **kw)
    ref_res = [ref.solve(b) for b in rhs]
    assert all(bool(r.converged) for r in ref_res)
    # (the lap-count WIN of recycling is covered by
    # TestRecycling.test_sequence_iterations_drop — this test pins resume
    # FIDELITY on a sequence whose rhs perturbations are uncorrelated)

    # Interrupted run: solve 0 completes, state saved; solve 1 is killed
    # mid-flight (maxiter cap models the crash) leaving its checkpoint.
    st_path = str(tmp_path / "stack.npz")
    ck = str(tmp_path / "inflight.npz")
    run1 = tpucg.RecyclingCG(op, **kw)
    run1.solve(rhs[0], checkpoint_path=ck)
    run1.save_state(st_path)
    partial = run1.solve(
        rhs[1], checkpoint_path=ck, segment_iters=4,
    )
    # force an interruption: cap the laps well below convergence
    if bool(partial.converged):
        # the warm solve converged before the cap — re-run the kill with
        # a tighter cap through a fresh sequence object
        run1b = tpucg.RecyclingCG(op, **kw)
        run1b.load_state(st_path)
        cfg = run1b.config
        from dataclasses import replace

        run1b.config = replace(cfg, maxiter=2)
        partial = run1b.solve(rhs[1], checkpoint_path=ck, segment_iters=2)
    assert not bool(partial.converged)
    assert os.path.exists(ck)

    # "Restarted process": new object, warm stack restored, in-flight
    # solve resumed from its checkpoint, sequence continues.
    run2 = tpucg.RecyclingCG(op, **kw)
    assert run2.load_state(st_path) == 1
    res1 = run2.solve(rhs[1], checkpoint_path=ck)
    res2 = run2.solve(rhs[2], checkpoint_path=ck)
    assert bool(res1.converged) and bool(res2.converged)
    assert int(res1.iterations) == int(ref_res[1].iterations)
    assert int(res2.iterations) == int(ref_res[2].iterations)
    np.testing.assert_array_equal(np.asarray(res1.x),
                                  np.asarray(ref_res[1].x))
    np.testing.assert_array_equal(np.asarray(res2.x),
                                  np.asarray(ref_res[2].x))


def test_checkpointed_deflated_matches_plain_deflated():
    """The checkpointed deflated recurrence must be the cg_solve_deflated
    recurrence exactly (same warm start, same projection-folded
    preconditioner), segmented or not."""
    from tpucg.solver.checkpoint import cg_solve_checkpointed

    A, Vlow = _clustered_spd(n=256, n_small=3, seed=5)
    b = np.random.default_rng(6).standard_normal(256).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    basis = tpucg.build_deflation_basis(A, Vlow)
    ref = tpucg.cg_solve_deflated(A, b, basis=basis, tol=tol, maxiter=1024)
    res = cg_solve_checkpointed(A, b, tol=tol, maxiter=1024,
                                segment_iters=3, basis=basis)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
