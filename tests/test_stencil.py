"""Pallas 3-D stencil kernel tests vs the XLA concat form and the CSR oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpucg
from tpucg.io.generator import poisson3d_csr
from tpucg.kernels.stencil import poisson3d_pallas, stencil_supported
from tpucg.solver.operators import PoissonOperator


def test_supported_predicate():
    assert stencil_supported(16)
    assert stencil_supported(32)
    assert stencil_supported(64)
    assert not stencil_supported(8)   # 64 lanes < 128
    assert not stencil_supported(24)  # 576 % 128 != 0


@pytest.mark.parametrize("m", [16, 32])
def test_pallas_matches_csr(m):
    csr = poisson3d_csr(m)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(m ** 3).astype(np.float32)
    y = np.asarray(poisson3d_pallas(jnp.asarray(u), m))
    y_ref = csr.matvec(u)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla_form():
    m = 16
    op = PoissonOperator(m=m)
    op_xla = PoissonOperator(m=m, kernel="xla")
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(m ** 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op.matvec(u)), np.asarray(op_xla.matvec(u)),
        rtol=1e-6, atol=1e-6,
    )


def test_unsupported_m_falls_back():
    op = PoissonOperator(m=8)  # auto -> XLA fallback
    u = jnp.ones(512, jnp.float32)
    y = np.asarray(op.matvec(u))
    csr = poisson3d_csr(8)
    np.testing.assert_allclose(y, csr.matvec(np.ones(512, np.float32)),
                               rtol=1e-6)
    with pytest.raises(ValueError, match="unsupported"):
        PoissonOperator(m=8, kernel="pallas").matvec(u)


def test_cg_solve_with_pallas_stencil():
    m = 16
    op = PoissonOperator(m=m)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(m ** 3).astype(np.float32)
    b = np.asarray(op.matvec(jnp.asarray(x_true)))
    tol = 1e-5 * float(np.linalg.norm(b))
    r = tpucg.cg_solve(op, b, tol=tol, maxiter=4 * m ** 3)
    assert bool(r.converged)
    np.testing.assert_allclose(np.asarray(r.x), x_true, atol=2e-3)
