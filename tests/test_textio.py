"""Reference text-format I/O tests."""

import os

import numpy as np
import pytest

from tpucg.io.textio import load_matrix, load_system, load_vector, save_array

REF = "/root/reference"


def test_round_trip_matrix(tmp_path):
    A = np.array([[2.0, -1.0], [-1.0, 2.0]], np.float32)
    path = str(tmp_path / "A.txt")
    save_array(path, A)
    got = load_matrix(path)
    np.testing.assert_allclose(got, A)


def test_round_trip_vector_exact(tmp_path):
    v = np.array([0.12345678, -9.87e-3, 4.0], np.float32)
    path = str(tmp_path / "v.txt")
    save_array(path, v, fmt="%r")
    got = load_vector(path, n=3)
    np.testing.assert_array_equal(got, v)


def test_missing_file_fails_loudly(tmp_path):
    # The reference continues with uninitialized memory here
    # (serialConjugate.c:101-104); tpucg must raise.
    with pytest.raises(FileNotFoundError):
        load_vector(str(tmp_path / "nope.txt"))


def test_wrong_count_rejected(tmp_path):
    path = str(tmp_path / "v.txt")
    save_array(path, np.arange(3, dtype=np.float32))
    with pytest.raises(ValueError):
        load_vector(path, n=5)
    with pytest.raises(ValueError):
        load_matrix(path)  # 3 values is not a square


def test_bom_noise_tolerated(tmp_path):
    # initialguess1.txt in the reference carries a stray UTF-8 BOM; the C
    # parser's %*c eats it. Our tokenizer must too.
    path = str(tmp_path / "bom.txt")
    with open(path, "wb") as f:
        f.write(b"1.0\n0.0\xef\xbb\xbf\n")
    got = load_vector(path, n=2)
    np.testing.assert_allclose(got, [1.0, 0.0])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_reference_shipped_files(golden_2x2, golden_4x4):
    A, b, x0 = load_system(
        f"{REF}/matrixA.txt", f"{REF}/vectorb.txt", f"{REF}/initialguess.txt"
    )
    np.testing.assert_allclose(A, golden_2x2["A"])
    np.testing.assert_allclose(b, golden_2x2["b"])
    np.testing.assert_allclose(x0, golden_2x2["x0"])
    A1, b1, x01 = load_system(
        f"{REF}/matrixA1.txt", f"{REF}/vectorb1.txt", f"{REF}/X0.txt"
    )
    np.testing.assert_allclose(A1, golden_4x4["A"])
    np.testing.assert_allclose(b1, golden_4x4["b"])
    # initialguess1.txt has the BOM; must parse as [1, 0]
    v = load_vector(f"{REF}/initialguess1.txt", n=2)
    np.testing.assert_allclose(v, [1.0, 0.0])


def test_f64_load_preserves_precision(tmp_path):
    """The native parser is f32-only; dtype=float64 loads must take the
    Python tokenizer so >7-significant-digit values survive intact."""
    import numpy as np

    from tpucg.io.textio import load_vector, save_array

    vals = np.array(
        [1.000000123456789, 3.141592653589793, -2.718281828459045e-3],
        np.float64,
    )
    p = tmp_path / "v64.txt"
    save_array(str(p), vals, fmt="%.17g")
    out = load_vector(str(p), n=3, dtype=np.float64)
    assert out.dtype == np.float64
    np.testing.assert_array_equal(out, vals)  # bit-exact through %.17g
    # And the f32 path still works (native or fallback).
    out32 = load_vector(str(p), n=3, dtype=np.float32)
    np.testing.assert_allclose(out32, vals.astype(np.float32), rtol=1e-7)


def test_npy_binary_io(tmp_path):
    """Binary .npy loads (the production format) through every loader,
    including mmap'd row-range reads."""
    import numpy as np

    from tpucg.io.textio import load_matrix, load_matrix_rows, load_vector

    rng = np.random.default_rng(7)
    n = 24
    A = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    pa, pb = str(tmp_path / "A.npy"), str(tmp_path / "b.npy")
    np.save(pa, A)
    np.save(pb, b)
    np.testing.assert_array_equal(load_matrix(pa), A)
    np.testing.assert_array_equal(load_vector(pb, n=n), b)
    np.testing.assert_array_equal(load_matrix_rows(pa, 5, 17, n), A[5:17])


def test_cli_convert_round_trip(tmp_path):
    import numpy as np

    from tpucg.cli import main
    from tpucg.io.textio import load_matrix, save_array

    rng = np.random.default_rng(8)
    A = rng.standard_normal((12, 12)).astype(np.float32)
    pt = str(tmp_path / "A.txt")
    pn = str(tmp_path / "A.npy")
    pt2 = str(tmp_path / "A2.txt")
    save_array(pt, A, fmt="%r")
    assert main(["convert", pt, pn]) == 0
    np.testing.assert_array_equal(np.load(pn), A)
    assert main(["convert", pn, pt2]) == 0
    np.testing.assert_array_equal(load_matrix(pt2), A)


def test_cli_solve_from_npy(tmp_path):
    import numpy as np

    import tpucg
    from tpucg.cli import main
    from tpucg.io.golden import GOLDEN_2X2

    g = GOLDEN_2X2
    pa, pb = str(tmp_path / "A.npy"), str(tmp_path / "b.npy")
    np.save(pa, g["A"])
    np.save(pb, g["b"])
    assert main(["solve", pa, pb]) == 0
    # sharded strategy uses the host-sharded loader over mmap'd npy
    assert main(["solve", pa, pb, "--strategy", "allgather"]) == 0
