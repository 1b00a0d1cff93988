"""Parity against the actual reference data files (skipped when the
reference checkout isn't mounted): proves the transcribed golden constants
in tpucg.io.golden match the shipped files bit-for-bit, and that solving
straight from those files reproduces the documented convergence facts
(SURVEY.md §3.5)."""

import os

import numpy as np
import pytest

import tpucg
from tpucg.io.golden import GOLDEN_2X2, GOLDEN_4X4
from tpucg.io.textio import load_system

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def test_2x2_files_match_transcription():
    A, b, x0 = load_system(
        os.path.join(REF, "matrixA.txt"),
        os.path.join(REF, "vectorb.txt"),
        os.path.join(REF, "initialguess.txt"),
    )
    np.testing.assert_array_equal(A, GOLDEN_2X2["A"])
    np.testing.assert_array_equal(b, GOLDEN_2X2["b"])
    np.testing.assert_array_equal(x0, GOLDEN_2X2["x0"])


def test_4x4_files_match_transcription():
    A, b, x0 = load_system(
        os.path.join(REF, "matrixA1.txt"),
        os.path.join(REF, "vectorb1.txt"),
        os.path.join(REF, "X0.txt"),
    )
    np.testing.assert_array_equal(A, GOLDEN_4X4["A"])
    np.testing.assert_array_equal(b, GOLDEN_4X4["b"])
    np.testing.assert_array_equal(x0, GOLDEN_4X4["x0"])


def test_bom_tolerant_alternate_guess():
    # initialguess1.txt ships with a UTF-8 BOM (SURVEY.md §2.1); the loader
    # must tolerate it like the reference's %f%*c parsing does.
    from tpucg.io.textio import load_vector

    x0 = load_vector(os.path.join(REF, "initialguess1.txt"), n=2)
    np.testing.assert_array_equal(x0, np.array([1.0, 0.0], np.float32))


def test_solve_from_reference_files():
    for files, expect in (
        (("matrixA.txt", "vectorb.txt", "initialguess.txt"), GOLDEN_2X2),
        (("matrixA1.txt", "vectorb1.txt", "X0.txt"), GOLDEN_4X4),
    ):
        A, b, x0 = load_system(*(os.path.join(REF, f) for f in files))
        r = tpucg.cg_solve(A, b, x0)
        assert int(r.iterations) == expect["iters"]
        np.testing.assert_allclose(
            np.asarray(r.x), expect["x_star"], atol=2e-3
        )
