"""NumPy oracle CG: golden systems + generator properties."""

import numpy as np

from tpucg.io.generator import generate_spd_system
from tpucg.solver.oracle import oracle_cg


def test_golden_2x2(golden_2x2):
    g = golden_2x2
    x, iters, rnorm = oracle_cg(g["A"], g["b"], g["x0"])
    np.testing.assert_allclose(x, g["x_star"], rtol=1e-6)
    assert iters == g["iters"]
    assert rnorm < 1e-6


def test_golden_4x4(golden_4x4):
    g = golden_4x4
    x, iters, rnorm = oracle_cg(g["A"], g["b"], g["x0"])
    np.testing.assert_allclose(x, g["x_star"], rtol=1e-5, atol=1e-5)
    assert iters == g["iters"]
    assert rnorm < 1e-6


def test_exact_initial_guess_is_zero_iters(golden_2x2):
    # The reference would compute alpha = 0/0 here; oracle returns k=0.
    g = golden_2x2
    x, iters, rnorm = oracle_cg(g["A"], g["b"], g["x_star"])
    assert iters == 0
    np.testing.assert_allclose(x, g["x_star"])


def test_generator_is_spd_and_solvable():
    A, b, x0 = generate_spd_system(64, seed=3)
    np.testing.assert_allclose(A, A.T)
    eigs = np.linalg.eigvalsh(A.astype(np.float64))
    assert eigs.min() > 0
    x, iters, rnorm = oracle_cg(A, b, x0)
    assert rnorm < 1e-6
    # Diagonal dominance (A += n*I) makes CG converge in a handful of
    # iterations — the reference's benchmark regime (BASELINE.md).
    assert iters <= 10
    np.testing.assert_allclose(A @ x, b, atol=1e-4)
