"""Pallas kernel unit tests (interpreter mode on CPU) vs NumPy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpucg.kernels.blas1 import dot_pallas, fused_update_pallas
from tpucg.kernels.matvec import matvec_pallas, matvec_xla
from tpucg.kernels.spmv import ell_spmv
from tpucg.io.generator import poisson3d_csr
from tpucg.sparse.formats import csr_to_ell


@pytest.mark.parametrize("shape", [(128, 128), (256, 512), (512, 1024)])
def test_matvec_pallas(shape):
    rng = np.random.default_rng(0)
    A = rng.standard_normal(shape).astype(np.float32)
    x = rng.standard_normal(shape[1]).astype(np.float32)
    got = np.asarray(matvec_pallas(jnp.asarray(A), jnp.asarray(x)))
    np.testing.assert_allclose(got, A @ x, rtol=1e-5, atol=1e-4)


def test_matvec_pallas_rejects_misaligned():
    A = jnp.zeros((120, 128))
    with pytest.raises(ValueError):
        matvec_pallas(A, jnp.zeros(128))


def test_matvec_xla_rectangular():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((16, 48)).astype(np.float32)
    x = rng.standard_normal(48).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(matvec_xla(jnp.asarray(A), jnp.asarray(x))),
        A @ x,
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("n", [128, 1024])
def test_dot_pallas(n):
    rng = np.random.default_rng(2)
    u = rng.standard_normal(n).astype(np.float32)
    v = rng.standard_normal(n).astype(np.float32)
    got = float(dot_pallas(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(got, float(u @ v), rtol=1e-5, atol=1e-4)


def test_fused_update_pallas():
    n = 512
    rng = np.random.default_rng(3)
    x, r, p, ap = (rng.standard_normal(n).astype(np.float32) for _ in range(4))
    alpha = np.float32(0.37)
    xn, rn, beta = fused_update_pallas(
        jnp.asarray(x), jnp.asarray(r), jnp.asarray(p), jnp.asarray(ap),
        jnp.float32(alpha),
    )
    exp_x = x + alpha * p
    exp_r = r - alpha * ap
    # fused multiply-add in the kernel rounds differently from NumPy's
    # two-op sequence; tolerance covers the one-ulp FMA difference
    np.testing.assert_allclose(np.asarray(xn), exp_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rn), exp_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(beta), float(exp_r @ exp_r), rtol=1e-5)


def test_ell_spmv_matches_csr():
    csr = poisson3d_csr(4)
    ell = csr_to_ell(csr)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(csr.shape[0]).astype(np.float32)
    got = np.asarray(
        ell_spmv(jnp.asarray(ell.values), jnp.asarray(ell.indices), jnp.asarray(x))
    )
    np.testing.assert_allclose(got, csr.matvec(x), rtol=1e-5, atol=1e-5)


def test_chain_extra_sizing():
    """Chain-repetition sizing: small estimates keep the classic floor of
    8 (the extra work must dominate ~25 ms dispatch jitter), large
    estimates drop to one extra solve (multi-second chained dispatches
    gain nothing and raise watchdog exposure), and the target_s budget
    bounds the middle."""
    from tpucg.bench.timing import _chain_extra

    assert _chain_extra(None, 0.05) == 8
    assert _chain_extra(0.0, 0.05) == 8
    assert _chain_extra(1e-5, 0.05) == 256   # capped
    assert _chain_extra(0.002, 0.05) == 25   # target/est
    assert _chain_extra(0.01, 0.05) == 5     # floor ceil(40ms/est)=4 < 5
    assert _chain_extra(0.05, 0.05) == 1
    assert _chain_extra(1.0, 0.05) == 1
