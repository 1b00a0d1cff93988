"""Whole-solve-in-one-kernel CG (kernels.fused).

One Pallas launch runs init + the complete while_loop + every lap's
matvec/BLAS-1 with A VMEM-resident — the fix for the small-n launch-floor
bound (RESULTS.md small-n caveat). Semantics must mirror cg_loop's
reference contract exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

import tpucg
from tpucg.config import CGConfig
from tpucg.io.partitioner import pad_identity_tail
from tpucg.kernels.fused import (
    FUSED_AUTO_MAX_N,
    FUSED_MAX_N,
    fused_cg_solve_pallas,
)
from tpucg.solver.cg import _fused_eligible
from tpucg.solver.operators import DenseOperator, as_operator


def _padded(A, b, x0, npad):
    Ap = pad_identity_tail(np.asarray(A, np.float32), npad)
    bp = np.zeros(npad, np.float32)
    bp[: len(b)] = b
    x0p = np.zeros(npad, np.float32)
    x0p[: len(x0)] = x0
    return jnp.asarray(Ap), jnp.asarray(bp), jnp.asarray(x0p)


@pytest.mark.parametrize("mv_impl", ["vpu", "mxu"])
def test_fused_matches_classic(mv_impl):
    n = 200
    A, b, x0 = tpucg.generate_spd_system(n, seed=0)
    ref = tpucg.cg_solve(A, b, x0, fused="never")
    Ap, bp, x0p = _padded(A, b, x0, 256)
    x, k, rr = fused_cg_solve_pallas(
        Ap, bp, x0p, tol=1e-6, maxiter=n, mv_impl=mv_impl
    )
    assert int(k) == int(ref.iterations)
    assert float(rr) < 1e-12
    np.testing.assert_allclose(
        np.asarray(x)[:n], np.asarray(ref.x), rtol=1e-5, atol=1e-7
    )


def test_fused_golden_contract(golden_2x2, golden_4x4):
    # The reference contract through the fused kernel: exact golden lap
    # counts (2 and 4) at tol 1e-6.
    for g in (golden_2x2, golden_4x4):
        n = g["A"].shape[0]
        Ap, bp, x0p = _padded(g["A"], g["b"], g["x0"], 128)
        x, k, rr = fused_cg_solve_pallas(Ap, bp, x0p, tol=1e-6, maxiter=128)
        assert int(k) == g["iters"]
        assert float(rr) < 1e-12
        np.testing.assert_allclose(
            np.asarray(x)[:n], g["x_star"], atol=2e-3
        )


def test_fused_maxiter_cap_and_exact_guess():
    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=4)
    A = (A - (n - n / 8.0) * np.eye(n)).astype(np.float32)
    Ap, bp, x0p = _padded(A, b, x0, 128)
    x, k, rr = fused_cg_solve_pallas(Ap, bp, x0p, tol=1e-6, maxiter=3)
    assert int(k) == 3
    assert float(rr) > 1e-12
    # Exact initial guess: flagged converged at k=0 (the reference would
    # divide 0/0, serialConjugate.c:219-220).
    ref = tpucg.cg_solve(A, b, fused="never")
    Ap, bp, xp = _padded(A, b, np.asarray(ref.x), 128)
    # b reconstructed so b - A x* is ~0 at f32: use A @ x* exactly.
    bstar = np.zeros(128, np.float32)
    bstar[:n] = (np.asarray(A, np.float64) @ np.asarray(ref.x, np.float64)
                 ).astype(np.float32)
    x, k, rr = fused_cg_solve_pallas(
        Ap, jnp.asarray(bstar), xp, tol=1e-4, maxiter=128
    )
    assert int(k) == 0


def test_fused_routing_through_cg_solve():
    # kernel="pallas" + small n engages the fused path (interpret mode off
    # TPU); result must match the while_loop path bit-near-exactly.
    n = 120
    A, b, x0 = tpucg.generate_spd_system(n, seed=2)
    never = tpucg.cg_solve(A, b, x0, kernel="pallas", fused="never")
    auto = tpucg.cg_solve(A, b, x0, kernel="pallas", fused="auto")
    always = tpucg.cg_solve(A, b, x0, kernel="pallas", fused="always")
    for r in (auto, always):
        assert bool(r.converged)
        assert abs(int(r.iterations) - int(never.iterations)) <= 1
        np.testing.assert_allclose(
            np.asarray(r.x), np.asarray(never.x), rtol=1e-5, atol=1e-7
        )
        assert np.asarray(r.x).shape == (n,)


def test_fused_eligibility_gate():
    n = 256
    A, b, x0 = tpucg.generate_spd_system(n, seed=1)
    op = as_operator(np.asarray(A), backend="pallas")
    cfg = CGConfig(kernel="pallas")
    assert _fused_eligible(cfg, op, "pallas", jnp.float32, False)
    # Every disqualifier flips it off.
    assert not _fused_eligible(cfg, op, "xla", jnp.float32, False)
    assert not _fused_eligible(cfg, op, "pallas", jnp.float32, True)
    assert _fused_eligible(
        CGConfig(kernel="pallas", precondition="jacobi"), op, "pallas",
        jnp.float32, False,
    ) == "dense"
    assert not _fused_eligible(
        CGConfig(kernel="pallas", fused="never"), op, "pallas",
        jnp.float32, False,
    )
    assert not _fused_eligible(
        CGConfig(kernel="pallas", method="pipelined"), op, "pallas",
        jnp.float32, False,
    )
    # bf16 storage keeps the streaming path.
    op_bf = DenseOperator.create(
        np.asarray(A), backend="pallas", dtype=jnp.bfloat16
    )
    assert not _fused_eligible(
        cfg, op_bf, "pallas", jnp.float32, False)
    # Above the auto crossover: only fused="always" engages, up to the
    # VMEM cap.
    big = DenseOperator(
        A=jnp.zeros((FUSED_AUTO_MAX_N + 128,) * 2, jnp.float32),
        n=FUSED_AUTO_MAX_N + 128, backend="pallas",
    )
    assert not _fused_eligible(cfg, big, "pallas", jnp.float32, False)
    assert _fused_eligible(
        CGConfig(kernel="pallas", fused="always"), big, "pallas",
        jnp.float32, False,
    )
    over = DenseOperator(
        A=jnp.zeros((FUSED_MAX_N + 128,) * 2, jnp.float32),
        n=FUSED_MAX_N + 128, backend="pallas",
    )
    assert not _fused_eligible(
        CGConfig(kernel="pallas", fused="always"), over, "pallas",
        jnp.float32, False,
    )


def test_fused_stencil_matches_classic():
    # Matrix-free Poisson whole-solve-in-one-kernel vs the while_loop path.
    from tpucg.kernels.fused import fused_stencil_cg_solve_pallas
    from tpucg.solver.operators import PoissonOperator

    m = 16
    n = m ** 3
    op = PoissonOperator(m=m)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(n).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    ref = tpucg.cg_solve(op, b, tol=tol, maxiter=4 * n, fused="never")
    x, k, rr = fused_stencil_cg_solve_pallas(
        jnp.asarray(b), jnp.zeros(n, jnp.float32), m, tol=tol, maxiter=4 * n
    )
    assert float(rr) < tol ** 2
    assert abs(int(k) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(ref.x), rtol=1e-4, atol=1e-5
    )


def test_fused_stencil_routing_through_cg_solve():
    from tpucg.solver.operators import PoissonOperator

    m = 16
    n = m ** 3
    op = PoissonOperator(m=m)
    b = np.ones(n, np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    never = tpucg.cg_solve(op, b, tol=tol, maxiter=4 * n,
                           kernel="pallas", fused="never")
    auto = tpucg.cg_solve(op, b, tol=tol, maxiter=4 * n,
                          kernel="pallas", fused="auto")
    assert bool(auto.converged)
    assert abs(int(auto.iterations) - int(never.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(auto.x), np.asarray(never.x), rtol=1e-4, atol=1e-5
    )
    assert np.asarray(auto.x).shape == (n,)


def test_fused_stencil_eligibility_gate():
    from tpucg.kernels.fused import (
        FUSED_STENCIL_MAX_M,
        fused_stencil_supported,
    )
    from tpucg.solver.operators import PoissonOperator

    cfg = CGConfig(kernel="pallas")
    op = PoissonOperator(m=16)
    assert _fused_eligible(
        cfg, op, "pallas", jnp.float32, False) == "stencil"
    # The XLA stencil form is not the fused kernel's layout.
    assert _fused_eligible(
        cfg, PoissonOperator(m=16, kernel="xla"), "pallas",
        jnp.float32, False,
    ) is None
    # Non-lane-tileable and beyond-VMEM grids stay on the while_loop path.
    assert _fused_eligible(
        cfg, PoissonOperator(m=10), "pallas", jnp.float32, False
    ) is None
    assert not fused_stencil_supported(FUSED_STENCIL_MAX_M + 16)
    # Preconditioned / traced solves are ineligible.
    assert _fused_eligible(
        cfg, op, "pallas", jnp.float32, True) is None


@pytest.mark.parametrize("m,seed", [(16, 1), (16, 2), (32, 3)])
def test_fused_stencil_fuzz(m, seed):
    # Random b AND nonzero x0 across supported grid edges: the fused
    # whole-solve must track the while_loop path lap-for-lap.
    from tpucg.kernels.fused import fused_stencil_cg_solve_pallas
    from tpucg.solver.operators import PoissonOperator

    n = m ** 3
    op = PoissonOperator(m=m)
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(n).astype(np.float32)
    x0 = 0.1 * rng.standard_normal(n).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    ref = tpucg.cg_solve(op, b, x0, tol=tol, maxiter=4 * n, fused="never")
    assert bool(ref.converged)
    x, k, rr = fused_stencil_cg_solve_pallas(
        jnp.asarray(b), jnp.asarray(x0), m, tol=tol, maxiter=4 * n
    )
    assert float(rr) < tol ** 2
    assert abs(int(k) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(ref.x), rtol=1e-3, atol=1e-4
    )


def test_fused_stencil_input_validation():
    from tpucg.kernels.fused import fused_stencil_cg_solve_pallas

    with pytest.raises(ValueError, match="fused stencil"):
        fused_stencil_cg_solve_pallas(
            jnp.zeros(1000), jnp.zeros(1000), 10, tol=1e-6, maxiter=4
        )


def test_fused_input_validation():
    with pytest.raises(ValueError, match="fused mode"):
        CGConfig(fused="sometimes")
    A = jnp.zeros((FUSED_MAX_N + 128, FUSED_MAX_N + 128), jnp.float32)
    with pytest.raises(ValueError, match="128-aligned"):
        fused_cg_solve_pallas(
            A, jnp.zeros(A.shape[0]), jnp.zeros(A.shape[0]),
            tol=1e-6, maxiter=4,
        )
    B = jnp.zeros((256, 256), jnp.bfloat16)
    with pytest.raises(ValueError, match="f32"):
        fused_cg_solve_pallas(
            B, jnp.zeros(256), jnp.zeros(256), tol=1e-6, maxiter=4
        )


# --------------------------- fused DIA whole-solve --------------------------


def _dia_from_dense_banded(A, offsets):
    """DIA container for a dense banded matrix (data[d, i] = A[i, i+off])."""
    from tpucg.sparse.formats import DIAMatrix

    n = A.shape[0]
    data = np.zeros((len(offsets), n), A.dtype)
    for d, off in enumerate(offsets):
        if off >= 0:
            idx = np.arange(n - off)
            data[d, : n - off] = A[idx, idx + off]
        else:
            k = -off
            idx = np.arange(k, n)
            data[d, k:] = A[idx, idx - k]
    return DIAMatrix(
        offsets=np.asarray(offsets, np.int64), data=data, shape=(n, n)
    )


def _random_banded_system(n, offsets, seed):
    """Random diag-dominant SPD matrix with the given symmetric band."""
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n), np.float32)
    for off in offsets:
        if off <= 0:
            continue
        idx = np.arange(n - off)
        v = rng.standard_normal(n - off).astype(np.float32)
        A[idx, idx + off] = v
        A[idx + off, idx] = v
    A[np.diag_indices(n)] = 1.0 + np.sum(np.abs(A), axis=1)
    b = rng.standard_normal(n).astype(np.float32)
    return A, b


@pytest.mark.parametrize("offsets,seed", [
    ((-130, -128, -3, -1, 0, 1, 3, 128, 130), 0),  # cross-row + rotate shifts
    ((-1, 0, 1), 1),                               # tridiagonal
    ((-257, 0, 257), 2),                           # pure multi-row reach
])
def test_fused_dia_matches_while_loop(offsets, seed):
    from tpucg.kernels.fused import fused_dia_cg_solve_pallas
    from tpucg.solver.operators import DiaOperator

    n = 512
    A, b = _random_banded_system(n, offsets, seed)
    dia = _dia_from_dense_banded(A, offsets)
    np.testing.assert_array_equal(dia.to_dense(), A)
    op = DiaOperator.from_dia(dia, backend="pallas")
    rng = np.random.default_rng(seed + 100)
    x0 = 0.1 * rng.standard_normal(n).astype(np.float32)
    ref = tpucg.cg_solve(op, b, x0, kernel="pallas", fused="never")
    assert bool(ref.converged)
    x, k, rr = fused_dia_cg_solve_pallas(
        op.data, op.offsets, jnp.asarray(np.pad(b, (0, op.padded_n - n))),
        jnp.asarray(np.pad(x0, (0, op.padded_n - n))),
        tol=1e-6, maxiter=n,
    )
    assert float(rr) < 1e-12
    assert abs(int(k) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(x)[:n], np.asarray(ref.x), rtol=1e-4, atol=1e-6
    )


def test_fused_dia_poisson_parity():
    # The m=16 Poisson in DIA form through the public cg_solve dispatch:
    # fused auto must track fused="never" lap-for-lap.
    from tpucg.io.generator import poisson3d_dia
    from tpucg.solver.operators import DiaOperator

    m = 16
    n = m ** 3
    op = DiaOperator.from_dia(poisson3d_dia(m), backend="pallas")
    b = np.ones(n, np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    cfg = CGConfig(kernel="pallas", tol=tol, maxiter=4 * n)
    assert _fused_eligible(
        cfg, op, "pallas", jnp.float32, False) == "dia"
    fused = tpucg.cg_solve(op, b, config=cfg)
    ref = tpucg.cg_solve(op, b, config=cfg, fused="never")
    assert bool(fused.converged) and bool(ref.converged)
    assert abs(int(fused.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(fused.x), np.asarray(ref.x), rtol=1e-3, atol=1e-4
    )


def test_fused_dia_eligibility_and_validation():
    from tpucg.kernels.fused import (
        fused_dia_cg_solve_pallas,
        fused_dia_supported,
    )
    from tpucg.solver.operators import DiaOperator

    # Budget gate: a huge banded system must fall back to the lap path.
    assert not fused_dia_supported(2 ** 26, (-1, 0, 1))
    assert fused_dia_supported(512, (-1, 0, 1))
    # Non-interleaved (XLA-backend) operators are never fused-eligible.
    A, b = _random_banded_system(512, (-1, 0, 1), 3)
    dia = _dia_from_dense_banded(A, (-1, 0, 1))
    op_x = DiaOperator.from_dia(dia, backend="xla")
    cfg = CGConfig(kernel="pallas")
    assert _fused_eligible(
        cfg, op_x, "pallas", jnp.float32, False) is None
    with pytest.raises(ValueError, match="fused DIA"):
        fused_dia_cg_solve_pallas(
            jnp.zeros((2 ** 19, 3 * 128)), (-1, 0, 1),
            jnp.zeros(2 ** 19 * 128), jnp.zeros(2 ** 19 * 128),
            tol=1e-6, maxiter=4,
        )


# ------------------------- in-kernel preconditioning ------------------------


def _scaled_spd_system(n, seed, spread=1e3):
    """SPD system with a badly scaled diagonal (D A D): Jacobi territory."""
    rng = np.random.default_rng(seed)
    A, b, _ = tpucg.generate_spd_system(n, seed=seed)
    d = np.exp(rng.uniform(0.0, np.log(spread), n)).astype(np.float32)
    A = (A * d[:, None] * d[None, :]).astype(np.float32)
    return A, np.asarray(b, np.float32)


@pytest.mark.parametrize("pc,deg", [("jacobi", 0), ("poly", 2), ("poly", 3)])
def test_fused_dense_precond_parity(pc, deg):
    # The fused dense kernel must run the SAME PCG recurrence as the lap
    # path (in-kernel power method included): matching lap counts and
    # solutions, and a genuine iteration cut vs unpreconditioned CG.
    # Each preconditioner gets the system it actually fixes: Jacobi a
    # badly diagonally scaled one; poly a Laplacian-conditioned one
    # (a Neumann polynomial cannot undo diagonal mis-scaling — measured
    # here, both paths cap out identically on the scaled system).
    n = 256
    if pc == "jacobi":
        A, b = _scaled_spd_system(n, seed=7)
    else:
        A = (
            2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
        ).astype(np.float32)
        b = np.cos(np.arange(n) * 0.3).astype(np.float32)
    cfg = CGConfig(
        kernel="pallas", precondition=pc, poly_degree=max(deg, 1),
        maxiter=4 * n, tol=1e-4 * float(np.linalg.norm(b)),
    )
    op = as_operator(jnp.asarray(A), backend="pallas")
    assert _fused_eligible(
        cfg, op, "pallas", jnp.float32, False,
    ) == "dense"
    fused = tpucg.cg_solve(A, b, config=cfg)
    ref = tpucg.cg_solve(A, b, config=cfg, fused="never")
    plain = tpucg.cg_solve(A, b, config=cfg, precondition="none",
                           fused="never")
    assert bool(fused.converged) and bool(ref.converged)
    assert abs(int(fused.iterations) - int(ref.iterations)) <= 2
    assert int(fused.iterations) < int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(fused.x), np.asarray(ref.x), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("pc", ["jacobi", "poly"])
def test_fused_dia_precond_parity(pc):
    # Banded system with a variable diagonal in DIA form: the fused kernel
    # reads 1/diag straight from the resident slab (jacobi) or builds the
    # polynomial in-kernel (poly); both must track the lap path.
    from tpucg.solver.operators import DiaOperator

    n = 512
    offsets = (-128, -1, 0, 1, 128)
    A, b = _random_banded_system(n, offsets, seed=11)
    rng = np.random.default_rng(12)
    d = np.exp(rng.uniform(0.0, np.log(30.0), n)).astype(np.float32)
    A = (A * d[:, None] * d[None, :]).astype(np.float32)
    dia = _dia_from_dense_banded(A, offsets)
    op = DiaOperator.from_dia(dia, backend="pallas")
    cfg = CGConfig(
        kernel="pallas", precondition=pc, poly_degree=2, maxiter=4 * n,
        tol=1e-4 * float(np.linalg.norm(b)),
    )
    assert _fused_eligible(
        cfg, op, "pallas", jnp.float32, False) == "dia"
    fused = tpucg.cg_solve(op, b, config=cfg)
    ref = tpucg.cg_solve(op, b, config=cfg, fused="never")
    assert bool(fused.converged) and bool(ref.converged)
    assert abs(int(fused.iterations) - int(ref.iterations)) <= 2
    np.testing.assert_allclose(
        np.asarray(fused.x), np.asarray(ref.x), rtol=2e-3, atol=2e-4
    )


def test_fused_stencil_poly_parity():
    # Poly-PCG fully inside the fused stencil kernel: must track the lap
    # path's iteration count and beat unpreconditioned lap counts.
    from tpucg.solver.operators import PoissonOperator

    m = 16
    n = m ** 3
    op = PoissonOperator(m=m, kernel="pallas")
    b = np.ones(n, np.float32)
    cfg = CGConfig(
        kernel="pallas", precondition="poly", poly_degree=3,
        maxiter=4 * n, tol=1e-5 * float(np.linalg.norm(b)),
    )
    assert _fused_eligible(
        cfg, op, "pallas", jnp.float32, False) == "stencil"
    fused = tpucg.cg_solve(op, b, config=cfg)
    ref = tpucg.cg_solve(op, b, config=cfg, fused="never")
    plain = tpucg.cg_solve(op, b, config=cfg, precondition="none")
    assert bool(fused.converged) and bool(ref.converged)
    # The two power methods reduce in different orders (in-kernel jnp.sum
    # vs dot_xla), so w — and with it the lap count — drifts a few laps
    # (measured: equal on TPU, 16 vs 20 on the CPU interpreter).
    assert abs(int(fused.iterations) - int(ref.iterations)) <= max(
        4, int(0.3 * int(ref.iterations))
    )
    assert int(fused.iterations) < int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(fused.x), np.asarray(ref.x), rtol=2e-3, atol=2e-4
    )


def test_fused_precond_eligibility_edges():
    from tpucg.io.generator import poisson3d_dia
    from tpucg.solver.operators import DiaOperator

    # Stencil + jacobi: iterate-exact no-op, stays on the lap path.
    from tpucg.solver.operators import PoissonOperator

    op_s = PoissonOperator(m=16, kernel="pallas")
    cfg_j = CGConfig(kernel="pallas", precondition="jacobi")
    assert _fused_eligible(
        cfg_j, op_s, "pallas", jnp.float32, False) is None
    # DIA without a stored main diagonal cannot feed jacobi.
    dia = poisson3d_dia(16)
    keep = dia.offsets != 0
    from tpucg.sparse.formats import DIAMatrix

    nod = DIAMatrix(
        offsets=dia.offsets[keep], data=dia.data[keep], shape=dia.shape
    )
    op_d = DiaOperator.from_dia(nod, backend="pallas")
    assert _fused_eligible(
        cfg_j, op_d, "pallas", jnp.float32, False) is None
    # Direct wrapper validation: jacobi without minv / without a diagonal.
    with pytest.raises(ValueError, match="minv"):
        fused_cg_solve_pallas(
            jnp.eye(128), jnp.zeros(128), jnp.zeros(128),
            tol=1e-6, maxiter=4, precondition="jacobi",
        )
    from tpucg.kernels.fused import (
        fused_dia_cg_solve_pallas,
        fused_stencil_cg_solve_pallas,
    )

    with pytest.raises(ValueError, match="main diagonal"):
        fused_dia_cg_solve_pallas(
            op_d.data, op_d.offsets,
            jnp.zeros(op_d.padded_n), jnp.zeros(op_d.padded_n),
            tol=1e-6, maxiter=4, precondition="jacobi",
        )
    with pytest.raises(ValueError, match="none/poly"):
        fused_stencil_cg_solve_pallas(
            jnp.zeros(16 ** 3), jnp.zeros(16 ** 3), 16,
            tol=1e-6, maxiter=4, precondition="jacobi",
        )
