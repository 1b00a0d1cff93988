"""Communication-avoiding (s-step) CG tests.

CA-CG completes tpucg's communication-strategy spectrum (the TPU-first
extension of the reference's collective-vs-p2p thesis, whose two arms differ
only in HOW each lap's 3 blocking reductions travel,
``parallel_cg.c:287-313``): classic CG pays 2-3 scalar reductions per lap,
pipelined CG fuses them into 1, CA-CG amortizes to ONE fused Gram reduction
per s laps (Chebyshev basis; see solver.cg.ca_cg_loop). Same Krylov iterates
as classic CG in exact arithmetic."""

import numpy as np
import pytest

import tpucg
from tpucg.config import CGConfig
from tpucg.comm.mesh import make_mesh2d
from tpucg.io.generator import poisson3d_csr
from tpucg.solver.oracle import oracle_cg
from tpucg.solver.operators import PoissonOperator
from tpucg.solver.sharded import sharded_operator_cg_solve


def test_ca_golden(golden_2x2, golden_4x4):
    for g in (golden_2x2, golden_4x4):
        n = g["A"].shape[0]
        r = tpucg.cg_solve(
            g["A"], g["b"], g["x0"], method="ca", maxiter=4 * n
        )
        assert bool(r.converged)
        # Near the ABSOLUTE 1e-6 floor the Gram-coordinate iterate is
        # measurably (true-residual-verified) a hair less converged than
        # classic CG's — the 4x4 golden takes 6 laps, not 4: the tentative
        # stop at lap 4 is REFUTED by the exact verification dot
        # (||b-Ax|| = 1.1e-6 > 1e-6), the safe restart then finishes.
        # That refute-and-restart is the designed graceful degradation;
        # classic/pipelined keep the exact golden lap counts.
        assert int(r.iterations) <= g["iters"] + 2
        np.testing.assert_allclose(np.asarray(r.x), g["x_star"], atol=2e-3)


@pytest.mark.parametrize("s_step", [1, 2, 3, 4])
def test_ca_matches_classic_clustered_spectrum(s_step):
    # The reference's generator family (A ~ n*I + noise) is the CLUSTERED
    # spectrum that collapses a monomial CA basis; the Chebyshev basis must
    # hold the classic iteration count.
    A, b, x0 = tpucg.generate_spd_system(128, seed=0)
    ref = tpucg.cg_solve(A, b, x0)
    ca = tpucg.cg_solve(A, b, x0, method="ca", s_step=s_step)
    assert bool(ca.converged)
    assert abs(int(ca.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(ca.x), np.asarray(ref.x), rtol=1e-4, atol=1e-6
    )
    # Honest reporting: residual_norm is the exact block-end ||r||.
    resid = np.linalg.norm(np.asarray(b) - np.asarray(A) @ np.asarray(ca.x))
    assert abs(float(ca.residual_norm) - resid) < 5e-6 + 0.5 * resid


def test_ca_spread_spectrum_many_iterations():
    # Mildly conditioned (dozens of laps, spectrum spread over ~1 decade):
    # the regime where a Newton (single-shift) basis collapses at s=3 and
    # Chebyshev must not.
    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=4)
    A = (A - (n - n / 12.0) * np.eye(n)).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    ref = tpucg.cg_solve(A, b, x0, tol=tol)
    assert int(ref.iterations) >= 10
    ca = tpucg.cg_solve(A, b, x0, method="ca", s_step=3, tol=tol)
    assert bool(ca.converged)
    assert abs(int(ca.iterations) - int(ref.iterations)) <= 3
    resid = np.linalg.norm(b - A @ np.asarray(ca.x))
    assert resid < 5 * tol


def test_ca_maxiter_cap_reports_honestly():
    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=4)
    A = (A - (n - n / 8.0) * np.eye(n)).astype(np.float32)
    r = tpucg.cg_solve(A, b, x0, method="ca", s_step=3, maxiter=4)
    # k never exceeds maxiter even mid-block (per-lap `active` gating).
    assert int(r.iterations) == 4
    assert not bool(r.converged)
    assert float(r.residual_norm) > 1e-6


def test_ca_sharded_both_strategies():
    n = 192
    A, b, x0 = tpucg.generate_spd_system(n, seed=2)
    tol = 1e-5 * float(np.linalg.norm(b))
    x_ref, k_ref, _ = oracle_cg(A, b, x0, tol=tol)
    for strategy in ("allgather", "overlap"):
        r = tpucg.sharded_cg_solve(
            A, b, x0, method="ca", s_step=3, strategy=strategy, tol=tol
        )
        assert bool(r.converged), strategy
        assert abs(int(r.iterations) - k_ref) <= 2
        np.testing.assert_allclose(
            np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-5
        )


def test_ca_sharded_padded_uneven():
    # Identity-tail padding: the pad subspace must not poison the spectral
    # interval estimate or the Gram coordinates.
    n = 67
    A, b, x0 = tpucg.generate_spd_system(n, seed=3)
    x_ref, _, _ = oracle_cg(A, b, x0)
    r = tpucg.sharded_cg_solve(A, b, x0, method="ca", s_step=3)
    assert bool(r.converged)
    assert np.asarray(r.x).shape == (n,)
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-6)


def test_ca_sharded_2d():
    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=1)
    x_ref, k_ref, _ = oracle_cg(A, b, x0)
    r = tpucg.sharded_cg_solve(
        A, b, x0, mesh=make_mesh2d(2, 4), method="ca", s_step=3
    )
    assert bool(r.converged)
    assert abs(int(r.iterations) - k_ref) <= 2
    np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-4, atol=1e-6)


def test_ca_poisson_operator_sharded():
    # Spread (Poisson) spectrum on the slab-halo decomposition: the Gram
    # psum and the 2s-1 halo-exchange basis matvecs both ride shard_map.
    m = 8
    op = PoissonOperator(m=m)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(m ** 3).astype(np.float32)
    b = np.asarray(op.matvec(np.asarray(x_true, np.float32)))
    tol = 1e-5 * float(np.linalg.norm(b))
    ser = tpucg.cg_solve(op, b, tol=tol, maxiter=4 * m ** 3)
    sh = sharded_operator_cg_solve(
        op, b, tol=tol, maxiter=4 * m ** 3, method="ca", s_step=3
    )
    assert bool(sh.converged)
    assert abs(int(sh.iterations) - int(ser.iterations)) <= 3
    np.testing.assert_allclose(np.asarray(sh.x), x_true, atol=1e-3)


def test_ca_dia_operator_sharded():
    from tpucg.io.generator import poisson3d_dia

    m = 6
    dia = poisson3d_dia(m)
    n = m ** 3  # 216 -> row-pads to 256: band-halo CA on a padded system
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = dia.matvec(x_true).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    sh = sharded_operator_cg_solve(
        dia, b, tol=tol, maxiter=4 * n, method="ca", s_step=3
    )
    assert bool(sh.converged)
    np.testing.assert_allclose(np.asarray(sh.x), x_true, atol=1e-3)


def test_ca_s1_degenerates_to_verified_cg():
    # s=1: one lap per block, but every lap's r.r is the EXACT dot (the
    # block-end verification) — a maximally-safe CA configuration.
    A, b, x0 = tpucg.generate_spd_system(64, seed=7)
    ref = tpucg.cg_solve(A, b, x0)
    ca = tpucg.cg_solve(A, b, x0, method="ca", s_step=1)
    assert bool(ca.converged)
    assert abs(int(ca.iterations) - int(ref.iterations)) <= 1


def test_ca_config_validation():
    with pytest.raises(ValueError, match="s_step"):
        CGConfig(s_step=0)
    with pytest.raises(ValueError, match="precondition"):
        CGConfig(method="ca", precondition="jacobi")
    A, b, x0 = tpucg.generate_spd_system(32, seed=0)
    with pytest.raises(ValueError, match="record_residuals"):
        tpucg.cg_solve(A, b, x0, method="ca", record_residuals=True)


def test_ca_scalar_identity_operator():
    # A = c*I has a zero-width spectrum — the h floor must keep the basis
    # finite and the solve must converge in one lap.
    n = 32
    A = (3.0 * np.eye(n)).astype(np.float32)
    b = np.linspace(1, 2, n).astype(np.float32)
    r = tpucg.cg_solve(A, b, method="ca", s_step=3)
    assert bool(r.converged)
    assert int(r.iterations) <= 2
    np.testing.assert_allclose(np.asarray(r.x), b / 3.0, rtol=1e-5)
