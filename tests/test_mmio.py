"""MatrixMarket (.mtx) loader/writer tests.

The reference reads only its own one-float-per-line text format
(serialConjugate.c:85-105); tpucg adds the standard sparse interchange
format so real SPD systems (SuiteSparse-style files) load directly.
"""


import numpy as np
import pytest

import tpucg
from tpucg.io.mmio import load_matrix_market, save_matrix_market
from tpucg.sparse.formats import COOMatrix


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


class TestLoad:
    def test_coordinate_general(self, tmp_path):
        path = _write(tmp_path, "a.mtx", "\n".join([
            "%%MatrixMarket matrix coordinate real general",
            "% a comment",
            "3 3 4",
            "1 1 2.0",
            "2 2 3.0",
            "3 3 4.0",
            "1 3 -1.5",
        ]) + "\n")
        coo = load_matrix_market(path)
        assert isinstance(coo, COOMatrix)
        assert coo.shape == (3, 3) and coo.nnz == 4
        want = np.array([[2, 0, -1.5], [0, 3, 0], [0, 0, 4]], np.float32)
        np.testing.assert_array_equal(coo.to_dense(), want)

    def test_coordinate_symmetric_expands(self, tmp_path):
        # Lower triangle of the golden 2x2 [[2,-1],[-1,2]].
        path = _write(tmp_path, "s.mtx", "\n".join([
            "%%MatrixMarket matrix coordinate real symmetric",
            "2 2 3",
            "1 1 2",
            "2 1 -1",
            "2 2 2",
        ]) + "\n")
        coo = load_matrix_market(path)
        assert coo.nnz == 4  # off-diagonal mirrored, diagonal not doubled
        want = np.array([[2, -1], [-1, 2]], np.float32)
        np.testing.assert_array_equal(coo.to_dense(), want)

    def test_coordinate_pattern(self, tmp_path):
        path = _write(tmp_path, "p.mtx", "\n".join([
            "%%MatrixMarket matrix coordinate pattern general",
            "2 2 2",
            "1 1",
            "2 2",
        ]) + "\n")
        coo = load_matrix_market(path)
        np.testing.assert_array_equal(coo.to_dense(), np.eye(2, dtype=np.float32))

    def test_array_general_column_major(self, tmp_path):
        path = _write(tmp_path, "d.mtx", "\n".join([
            "%%MatrixMarket matrix array real general",
            "2 2",
            "1", "2", "3", "4",
        ]) + "\n")
        A = load_matrix_market(path)
        assert isinstance(A, np.ndarray)
        np.testing.assert_array_equal(
            A, np.array([[1, 3], [2, 4]], np.float32))

    def test_array_symmetric(self, tmp_path):
        # Column-major lower triangle of [[2,-1],[-1,2]]: (1,1),(2,1),(2,2).
        path = _write(tmp_path, "ds.mtx", "\n".join([
            "%%MatrixMarket matrix array real symmetric",
            "2 2",
            "2", "-1", "2",
        ]) + "\n")
        A = load_matrix_market(path)
        np.testing.assert_array_equal(
            A, np.array([[2, -1], [-1, 2]], np.float32))

    @pytest.mark.parametrize("header,msg", [
        ("%%MatrixMarket matrix coordinate complex general", "field"),
        ("%%MatrixMarket matrix coordinate real skew-symmetric", "symmetry"),
        ("%%MatrixMarket matrix coordinate real hermitian", "symmetry"),
        ("not a banner at all", "MatrixMarket"),
    ])
    def test_rejects_unsupported(self, tmp_path, header, msg):
        path = _write(tmp_path, "bad.mtx",
                      header + "\n2 2 1\n1 1 1.0\n")
        with pytest.raises(ValueError, match=msg):
            load_matrix_market(path)

    def test_rejects_bad_counts_and_indices(self, tmp_path):
        short = _write(tmp_path, "short.mtx", "\n".join([
            "%%MatrixMarket matrix coordinate real general",
            "2 2 2",
            "1 1 1.0",
        ]) + "\n")
        with pytest.raises(ValueError, match="expected 2 entries"):
            load_matrix_market(short)
        oob = _write(tmp_path, "oob.mtx", "\n".join([
            "%%MatrixMarket matrix coordinate real general",
            "2 2 1",
            "3 1 1.0",
        ]) + "\n")
        with pytest.raises(ValueError, match="out of range"):
            load_matrix_market(oob)


class TestRoundTrip:
    def test_coo_general(self, tmp_path):
        csr = tpucg.poisson3d_csr(3)
        path = str(tmp_path / "rt.mtx")
        save_matrix_market(path, csr.to_coo())
        back = load_matrix_market(path)
        np.testing.assert_allclose(back.to_dense(), csr.to_dense(),
                                   rtol=1e-6)

    def test_coo_symmetric_storage_halves_file(self, tmp_path):
        csr = tpucg.poisson3d_csr(3)
        pg = str(tmp_path / "g.mtx")
        ps = str(tmp_path / "s.mtx")
        save_matrix_market(pg, csr.to_coo())
        save_matrix_market(ps, csr.to_coo(), symmetric=True)
        # symmetric file stores only the lower triangle
        import os
        assert os.path.getsize(ps) < os.path.getsize(pg)
        np.testing.assert_allclose(
            load_matrix_market(ps).to_dense(), csr.to_dense(), rtol=1e-6)

    def test_dense_and_vector(self, tmp_path):
        A, b, _ = tpucg.generate_spd_system(8, seed=3)
        pa = str(tmp_path / "A.mtx")
        pb = str(tmp_path / "b.mtx")
        save_matrix_market(pa, np.asarray(A), symmetric=True)
        save_matrix_market(pb, np.asarray(b))
        np.testing.assert_allclose(load_matrix_market(pa), np.asarray(A),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(load_matrix_market(pb).ravel(),
                                   np.asarray(b), rtol=1e-6)

    def test_csr_input_accepted(self, tmp_path):
        csr = tpucg.poisson3d_csr(2)
        path = str(tmp_path / "c.mtx")
        save_matrix_market(path, csr)
        np.testing.assert_allclose(load_matrix_market(path).to_dense(),
                                   csr.to_dense(), rtol=1e-6)


class TestSolveEndToEnd:
    def test_mtx_to_operator_solve(self, tmp_path):
        """SuiteSparse-style flow: .mtx (symmetric) -> best_sparse_operator
        -> cg_solve, parity with the dense oracle."""
        from tpucg.solver.oracle import oracle_cg

        csr = tpucg.poisson3d_csr(4)
        path = str(tmp_path / "poisson.mtx")
        save_matrix_market(path, csr.to_coo(), symmetric=True,
                           comment="3-D 7-point Poisson m=4")
        coo = load_matrix_market(path)
        op = tpucg.best_sparse_operator(coo.to_csr())
        n = coo.shape[0]
        b = np.ones(n, np.float32)
        tol = 1e-5 * float(np.linalg.norm(b))
        res = tpucg.cg_solve(op, b, tol=tol, maxiter=4 * n)
        assert bool(res.converged)
        x_ref, k_ref, _ = oracle_cg(csr.to_dense().astype(np.float32), b,
                                    np.zeros(n, np.float32), tol=tol)
        assert abs(int(res.iterations) - k_ref) <= 1
        np.testing.assert_allclose(np.asarray(res.x), x_ref,
                                   rtol=1e-3, atol=1e-4)


class TestCLI:
    """In-process `main([...])` so the conftest's CPU platform applies
    (same pattern as tests/test_cli.py)."""

    def _fixtures(self, tmp_path, m=3):
        csr = tpucg.poisson3d_csr(m)
        pa = str(tmp_path / "A.mtx")
        pb = str(tmp_path / "b.mtx")
        save_matrix_market(pa, csr.to_coo(), symmetric=True)
        save_matrix_market(pb, np.ones(csr.shape[0], np.float32))
        return csr, pa, pb

    def test_solve_mtx(self, tmp_path, capsys):
        from tpucg.cli import main

        _, pa, pb = self._fixtures(tmp_path)
        rc = main(["solve", pa, pb, "--tol", "1e-4"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "converged            : True" in out
        assert "DiaOperator" in out  # banded Poisson auto-promotes

    def test_solve_mtx_sharded(self, tmp_path, capsys):
        from tpucg.cli import main

        _, pa, pb = self._fixtures(tmp_path)
        rc = main(["solve", pa, pb, "--tol", "1e-4",
                   "--strategy", "allgather", "--devices", "2"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "converged            : True" in out

    def test_convert_mtx_npy_roundtrip(self, tmp_path):
        from tpucg.cli import main

        csr = tpucg.poisson3d_csr(2)
        src = str(tmp_path / "A.mtx")
        mid = str(tmp_path / "A.npy")
        back = str(tmp_path / "B.mtx")
        save_matrix_market(src, csr.to_coo())
        assert main(["convert", src, mid]) == 0
        np.testing.assert_allclose(np.load(mid), csr.to_dense(), rtol=1e-6)
        assert main(["convert", mid, back]) == 0
        np.testing.assert_allclose(load_matrix_market(back),
                                   csr.to_dense(), rtol=1e-6)
