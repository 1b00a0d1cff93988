"""Tests for the native C++ fast parser (native/fastio.cpp) and its ctypes
bridge (tpucg/io/_native.py). The parser must agree exactly with the portable
NumPy tokenizer on the reference text format, including its noise tolerance
(BOM bytes, CRLF, blank lines — ``serialConjugate.c:96`` fscanf %f%*c)."""

import os

import numpy as np
import pytest

from tpucg.io import _native
from tpucg.io.textio import _FLOAT_RE, load_matrix, load_vector, save_array


@pytest.fixture(scope="module")
def native_lib():
    lib = _native._load()
    if lib is None:
        pytest.skip("native libfastio.so unavailable (no g++/make?)")
    return lib


def _python_parse(path):
    with open(path, "rb") as f:
        data = f.read()
    return np.array([float(t) for t in _FLOAT_RE.findall(data)], np.float32)


def test_parse_simple(native_lib, tmp_path):
    p = tmp_path / "v.txt"
    vals = np.array([1.5, -2.25, 0.0, 3e4, -1e-3], np.float32)
    save_array(str(p), vals, fmt="%r")
    out = _native.parse_floats(str(p))
    np.testing.assert_array_equal(out, vals)


def test_parse_noise_tolerance(native_lib, tmp_path):
    # BOM + CRLF + blank lines + trailing junk, like initialguess1.txt's BOM.
    p = tmp_path / "noisy.txt"
    p.write_bytes(b"\xef\xbb\xbf1.0\r\n\r\n-2.5\r\n3.25\n\n")
    out = _native.parse_floats(str(p))
    np.testing.assert_array_equal(
        out, np.array([1.0, -2.5, 3.25], np.float32)
    )
    np.testing.assert_array_equal(out, _python_parse(str(p)))


def test_parse_matches_python_on_random(native_lib, tmp_path):
    rng = np.random.default_rng(7)
    vals = (rng.standard_normal(4096) * 10).astype(np.float32)
    p = tmp_path / "r.txt"
    save_array(str(p), vals, fmt="%.6e")
    out = _native.parse_floats(str(p))
    ref = _python_parse(str(p))
    np.testing.assert_array_equal(out, ref)


def test_parse_large_multithreaded(native_lib, tmp_path):
    # > 1 MB so the chunk-parallel path runs; order must still be exact.
    rng = np.random.default_rng(11)
    vals = rng.random(200_000).astype(np.float32)
    p = tmp_path / "big.txt"
    save_array(str(p), vals, fmt="%.8f")
    assert os.path.getsize(str(p)) > (1 << 20)
    out = _native.parse_floats(str(p))
    ref = _python_parse(str(p))
    assert out.size == ref.size == vals.size
    np.testing.assert_array_equal(out, ref)


def test_missing_file_returns_error(native_lib, tmp_path):
    assert native_lib.fastio_count_floats(
        os.fsencode(str(tmp_path / "nope.txt"))
    ) == -1


def test_textio_uses_native_path(native_lib, tmp_path):
    # End-to-end through load_matrix/load_vector with the lib loaded.
    A = np.array([[2.0, -1.0], [-1.0, 2.0]], np.float32)
    b = np.array([1.0, 0.0], np.float32)
    pa, pb = tmp_path / "A.txt", tmp_path / "b.txt"
    save_array(str(pa), A, fmt="%r")
    save_array(str(pb), b, fmt="%r")
    np.testing.assert_array_equal(load_matrix(str(pa)), A)
    np.testing.assert_array_equal(load_vector(str(pb), n=2), b)


def test_parse_range(native_lib, tmp_path):
    rng = np.random.default_rng(3)
    vals = rng.random(10_000).astype(np.float32)
    p = tmp_path / "rng.txt"
    save_array(str(p), vals, fmt="%r")
    out = _native.parse_floats_range(str(p), 1234, 567)
    np.testing.assert_array_equal(out, vals[1234:1234 + 567])
    np.testing.assert_array_equal(
        _native.parse_floats_range(str(p), 0, 10), vals[:10]
    )
    np.testing.assert_array_equal(
        _native.parse_floats_range(str(p), 9_990, 10), vals[-10:]
    )
    with pytest.raises(ValueError, match="yielded"):
        _native.parse_floats_range(str(p), 9_999, 5)


def test_parse_range_multithreaded(native_lib, tmp_path):
    rng = np.random.default_rng(4)
    vals = rng.random(300_000).astype(np.float32)
    p = tmp_path / "big_rng.txt"
    save_array(str(p), vals, fmt="%.8f")
    assert os.path.getsize(str(p)) > (1 << 20)
    ref = _python_parse(str(p))
    out = _native.parse_floats_range(str(p), 100_001, 123_456)
    np.testing.assert_array_equal(out, ref[100_001:100_001 + 123_456])


def test_load_matrix_rows(native_lib, tmp_path):
    from tpucg.io.textio import load_matrix, load_matrix_rows

    rng = np.random.default_rng(5)
    n = 40
    A = rng.random((n, n)).astype(np.float32)
    p = tmp_path / "A.txt"
    save_array(str(p), A, fmt="%r")
    np.testing.assert_array_equal(load_matrix_rows(str(p), 7, 23, n), A[7:23])
    np.testing.assert_array_equal(load_matrix_rows(str(p), 0, n, n), A)
    np.testing.assert_array_equal(load_matrix(str(p)), A)


def test_huge_exponents_saturate(native_lib, tmp_path):
    """Tokens overflowing f32 exercise the strtof fallback inside the mmap'd
    scanner (from_chars reports out_of_range; the token is copied to a local
    buffer because the mapping has no trailing NUL)."""
    p = tmp_path / "huge.txt"
    p.write_bytes(b"1e9999\n-1e9999\n1e-9999\n2.5\n")
    out = _native.parse_floats(str(p))
    assert out.size == 4
    assert np.isinf(out[0]) and out[0] > 0
    assert np.isinf(out[1]) and out[1] < 0
    assert out[2] == 0.0  # underflow saturates to zero
    assert out[3] == np.float32(2.5)


def test_plus_signs_and_exponent_forms(native_lib, tmp_path):
    p = tmp_path / "forms.txt"
    p.write_bytes(b"+1.5\n+2e3\n.5\n-.25\n3.\n")
    out = _native.parse_floats(str(p))
    np.testing.assert_array_equal(
        out, np.array([1.5, 2000.0, 0.5, -0.25, 3.0], np.float32)
    )
    np.testing.assert_array_equal(out, _python_parse(str(p)))


def test_long_token_saturation(native_lib, tmp_path):
    """Tokens longer than any fixed fallback buffer must still saturate
    correctly (a 64-byte truncation once parsed 0.00...01e400 as 0)."""
    p = tmp_path / "long.txt"
    p.write_bytes(
        b"0." + b"0" * 70 + b"1e400\n"     # ~1e329 -> +inf
        + b"1" + b"0" * 70 + b"e-400\n"    # ~1e-330 -> 0
        + b"7.0\n"
    )
    out = _native.parse_floats(str(p))
    assert out.size == 3
    assert np.isinf(out[0]) and out[0] > 0
    assert out[1] == 0.0
    assert out[2] == np.float32(7.0)


def test_inf_nan_tokens(native_lib, tmp_path):
    """fscanf %f accepts inf/nan in both signed and bare forms; dropping the
    bare ones would shift every later value one slot (silent corruption)."""
    p = tmp_path / "infnan.txt"
    p.write_bytes(b"inf\n-inf\nnan\n-nan\n1.0\nInfinity\n2.0\n")
    out = _native.parse_floats(str(p))
    assert out.size == 7
    assert np.isinf(out[0]) and out[0] > 0
    assert np.isinf(out[1]) and out[1] < 0
    assert np.isnan(out[2]) and np.isnan(out[3])
    assert out[4] == np.float32(1.0)
    assert np.isinf(out[5]) and out[5] > 0
    assert out[6] == np.float32(2.0)


def test_python_fallback_matches_native_on_infnan(native_lib, tmp_path):
    p = tmp_path / "mix.txt"
    p.write_bytes(b"1.5\ninf\n-nan\n2.5\n")
    nat = _native.parse_floats(str(p))
    ref = _python_parse(str(p))
    assert nat.size == ref.size == 4
    np.testing.assert_array_equal(np.isnan(nat), np.isnan(ref))
    mask = ~np.isnan(ref)
    np.testing.assert_array_equal(nat[mask], ref[mask])
