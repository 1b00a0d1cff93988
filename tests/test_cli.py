"""CLI surface tests (``python -m tpucg``), run in-process so the conftest's
forced 8-device CPU platform applies. The CLI is the replacement for the
reference's four compiled entry points (``serialConjugate.c:43``,
``parallel_cg.c:53``, ...) with runtime flags instead of #defines."""

import json
import os

import numpy as np
import pytest

from tpucg.cli import main
from tpucg.io.golden import GOLDEN_2X2
from tpucg.io.textio import load_vector, save_array


@pytest.fixture
def golden_files(tmp_path):
    g = GOLDEN_2X2
    pa, pb, px = (tmp_path / n for n in ("A.txt", "b.txt", "x0.txt"))
    save_array(str(pa), g["A"], fmt="%r")
    save_array(str(pb), g["b"], fmt="%r")
    save_array(str(px), g["x0"], fmt="%r")
    return str(pa), str(pb), str(px)


def test_solve_golden(golden_files, tmp_path, capsys):
    pa, pb, px = golden_files
    out = tmp_path / "x.txt"
    rc = main(["solve", pa, pb, px, "--output", str(out), "--print-solution"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "iterations           : 2" in text
    assert "converged            : True" in text
    x = load_vector(str(out), n=2)
    np.testing.assert_allclose(x, GOLDEN_2X2["x_star"], atol=1e-6)


def test_solve_sharded_strategies(golden_files, tmp_path, capsys):
    # 2x2 padded over the 8-device CPU mesh — exercises padding + sharding.
    pa, pb, px = golden_files
    for strategy in ("allgather", "overlap"):
        rc = main(["solve", pa, pb, px, "--strategy", strategy])
        assert rc == 0, strategy
        assert "converged            : True" in capsys.readouterr().out


def test_solve_missing_file_fails_loudly(tmp_path):
    with pytest.raises(FileNotFoundError):
        main(["solve", str(tmp_path / "no.txt"), str(tmp_path / "no2.txt")])


def test_generate_roundtrip(tmp_path, capsys):
    rc = main(["generate", "32", "--seed", "3", "--out-dir", str(tmp_path)])
    assert rc == 0
    rc = main([
        "solve",
        str(tmp_path / "matrix32X32.txt"),
        str(tmp_path / "vector32X1.txt"),
        str(tmp_path / "X32X1.txt"),
    ])
    assert rc == 0
    assert "converged            : True" in capsys.readouterr().out


def test_selftest(capsys):
    rc = main(["selftest", "--n", "64"])
    text = capsys.readouterr().out
    assert rc == 0, text
    assert "all selftests passed" in text


def test_bench_json(capsys):
    rc = main(["bench", "--n", "256", "--repeats", "1", "--json"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n"] == 256
    assert rep["iterations"] >= 1
    assert rep["solve_s"] > 0


def test_info(capsys):
    rc = main(["info"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["device_count"] == 8  # forced CPU mesh
    assert info["kernel_backend"] in ("pallas", "xla")


def test_bench_poisson_free(capsys):
    rc = main(["bench", "--operator", "poisson-free", "--m", "8",
               "--repeats", "1", "--json", "--tol", "1e-4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n"] == 512
    assert rep["iterations"] >= 1


def test_bench_compare_strategies(capsys):
    rc = main(["bench", "--n", "128", "--repeats", "1", "--json",
               "--compare-strategies"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    reps = [json.loads(l) for l in lines]
    assert len(reps) == 3
    assert {r["strategy"].split("/")[0] for r in reps} == {
        "serial", "allgather", "overlap"
    }


def test_solve_pipelined_jacobi_flags(golden_files, capsys):
    pa, pb, px = golden_files
    rc = main(["solve", pa, pb, px, "--method", "pipelined"])
    assert rc == 0
    assert "iterations           : 2" in capsys.readouterr().out
    rc = main(["solve", pa, pb, px, "--precondition", "jacobi"])
    assert rc == 0
    assert "converged            : True" in capsys.readouterr().out


def test_solve_residual_history_flag(golden_files, capsys):
    pa, pb, px = golden_files
    rc = main(["solve", pa, pb, px, "--residual-history"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "||r_0||" in text and "||r_2||" in text


def test_bench_poisson_dia(capsys):
    rc = main(["bench", "--operator", "poisson-dia", "--m", "8",
               "--repeats", "1", "--json"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n"] == 512
    assert rep["nnz_per_s"] is None or rep["nnz_per_s"] > 0


def test_cli_solve_checkpointed(tmp_path):
    """CLI segmented solve: capped run retains the checkpoint, re-run
    resumes to convergence (serial and sharded strategies)."""
    import tpucg
    from tpucg.io.textio import save_array

    n = 96
    A, b, x0 = tpucg.generate_spd_system(n, seed=4)
    A = (A - (n - n / 8.0) * np.eye(n)).astype(np.float32)
    pa, pb, px = (str(tmp_path / f) for f in ("A.txt", "b.txt", "x0.txt"))
    save_array(pa, A, fmt="%r")
    save_array(pb, b, fmt="%r")
    save_array(px, x0, fmt="%r")
    ck = str(tmp_path / "state.npz")
    out = str(tmp_path / "x.txt")
    rc = main([
        "solve", pa, pb, px, "--checkpoint", ck, "--segment-iters", "4",
        "--maxiter", "8",
    ])
    assert rc == 3  # capped, not converged
    assert os.path.exists(ck)
    rc = main([
        "solve", pa, pb, px, "--checkpoint", ck, "--segment-iters", "4",
        "--output", out,
    ])
    assert rc == 0
    assert not os.path.exists(ck)
    x = np.loadtxt(out, dtype=np.float32)
    ref = tpucg.cg_solve(A, b, x0)
    np.testing.assert_allclose(x, np.asarray(ref.x), rtol=1e-5, atol=1e-6)
    # Sharded strategy through the same flag.
    ck2 = str(tmp_path / "state2.npz")
    rc = main([
        "solve", pa, pb, px, "--checkpoint", ck2, "--segment-iters", "6",
        "--strategy", "allgather",
    ])
    assert rc == 0


def test_cli_bench_poisson_auto(capsys):
    rc = main([
        "bench", "--operator", "poisson-auto", "--m", "8", "--repeats", "1",
        "--json",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "poisson-auto[dia]" in out  # banded -> DIA promotion


def test_cli_checkpoint_rejects_pipelined_and_prints_solution(tmp_path, capsys):
    """Regression (round-2 review): --method must reach the library guard
    (pipelined state is not checkpointable) and --print-solution must work
    with --checkpoint."""
    import tpucg
    from tpucg.io.textio import save_array

    n = 16
    A, b, x0 = tpucg.generate_spd_system(n, seed=1)
    pa, pb = str(tmp_path / "A.txt"), str(tmp_path / "b.txt")
    save_array(pa, A, fmt="%r")
    save_array(pb, b, fmt="%r")
    ck = str(tmp_path / "s.npz")
    with pytest.raises(ValueError, match="cg"):
        main(["solve", pa, pb, "--checkpoint", ck, "--method", "pipelined"])
    rc = main(["solve", pa, pb, "--checkpoint", ck, "--print-solution"])
    assert rc == 0
    assert "x                    :" in capsys.readouterr().out


def test_solve_chebyshev_flags(golden_files, capsys):
    pa, pb, px = golden_files
    rc = main(["solve", pa, pb, px, "--method", "chebyshev",
               "--check-every", "4", "--maxiter", "256"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "converged            : True" in out
    rc = main(["solve", pa, pb, px, "--method", "chebyshev",
               "--check-every", "4", "--precondition", "jacobi",
               "--maxiter", "256"])
    assert rc == 0
    assert "converged            : True" in capsys.readouterr().out


def test_solve_block_jacobi_flags(golden_files, capsys):
    pa, pb, px = golden_files
    rc = main(["solve", pa, pb, px, "--precondition", "block_jacobi",
               "--pc-block-size", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "converged            : True" in out


def test_solve_minres_flag(tmp_path, capsys):
    # Symmetric INDEFINITE system through --method minres (CG would be
    # outside contract), serial and sharded.
    rng = np.random.default_rng(60)
    n = 64
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([-(1 + rng.uniform(0, 1, n // 2)),
                          1 + rng.uniform(0, 1, n - n // 2)])
    A = ((Q * lam) @ Q.T).astype(np.float32)
    A = 0.5 * (A + A.T)
    b = rng.standard_normal(n).astype(np.float32)
    pa, pb = str(tmp_path / "A.txt"), str(tmp_path / "b.txt")
    save_array(pa, A, fmt="%r")
    save_array(pb, b, fmt="%r")
    tol = 1e-4 * float(np.linalg.norm(b))
    for extra in ([], ["--strategy", "allgather"]):
        rc = main(["solve", pa, pb, "--method", "minres",
                   "--tol", str(tol), "--maxiter", str(8 * n)] + extra)
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "converged            : True" in out


def test_solve_bf16_storage_flag(golden_files, capsys):
    pa, pb, px = golden_files
    rc = main(["solve", pa, pb, px, "--storage", "bf16"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "iterations           : 2" in out


def test_solve_mtx_minres_and_bf16(tmp_path, capsys):
    # Banded indefinite .mtx solved by --method minres; the same system
    # with --storage bf16 under CG... (SPD variant) — both through the
    # DIA promotion.
    import tpucg
    from tpucg.sparse.formats import DIAMatrix

    n = 256
    data = np.zeros((3, n), np.float32)
    data[0] = data[2] = -1.0
    data[1] = 0.3  # shifted 1-D Laplacian: indefinite
    dia = DIAMatrix(data=data, offsets=(-1, 0, 1), shape=(n, n))
    coo = dia.to_dense()
    amtx = str(tmp_path / "A.mtx")
    bmtx = str(tmp_path / "b.mtx")
    from tpucg.sparse.formats import COOMatrix

    rows, cols = np.nonzero(coo)
    tpucg.save_matrix_market(
        amtx,
        COOMatrix(row=rows, col=cols, data=coo[rows, cols],
                  shape=(n, n)),
        symmetric=True,
    )
    b = np.random.default_rng(61).standard_normal(n).astype(np.float32)
    tpucg.save_matrix_market(bmtx, b)
    tol = 1e-4 * float(np.linalg.norm(b))
    rc = main(["solve", amtx, bmtx, "--method", "minres",
               "--tol", str(tol), "--maxiter", str(8 * n)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "converged            : True" in out

    # SPD variant (diag 2.5) with bf16 DIA storage under plain CG.
    data2 = data.copy()
    data2[1] = 2.5
    dia2 = DIAMatrix(data=data2, offsets=(-1, 0, 1), shape=(n, n))
    coo2 = dia2.to_dense()
    rows2, cols2 = np.nonzero(coo2)
    amtx2 = str(tmp_path / "A2.mtx")
    tpucg.save_matrix_market(
        amtx2,
        COOMatrix(row=rows2, col=cols2, data=coo2[rows2, cols2],
                  shape=(n, n)),
        symmetric=True,
    )
    rc = main(["solve", amtx2, bmtx, "--storage", "bf16",
               "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "+bf16" in out and "converged            : True" in out


def test_minres_rejects_two_level_and_interval(tmp_path):
    # --two-level/--interval would be silently dropped by the minres path
    # while the report stamped "+2lvl" into the format string (ADVICE r4);
    # the CLI must refuse the combination loudly instead.
    import tpucg
    from tpucg.io.generator import random_geometric_spd

    A, b, _ = random_geometric_spd(300, seed=63, avg_degree=6.0)
    amtx = str(tmp_path / "A.mtx")
    bmtx = str(tmp_path / "b.mtx")
    tpucg.save_matrix_market(amtx, A.to_coo(), symmetric=True)
    tpucg.save_matrix_market(bmtx, b)
    with pytest.raises(SystemExit, match="minres"):
        main(["solve", amtx, bmtx, "--method", "minres",
              "--two-level", "32"])
    with pytest.raises(SystemExit, match="minres"):
        main(["solve", amtx, bmtx, "--method", "minres",
              "--interval", "0.1", "4.0"])


def test_solve_mtx_checkpoint_two_level_resume(tmp_path, capsys):
    """CLI end-to-end for the irregular checkpointed path (VERDICT r4 #4):
    a WELL-promoted .mtx solve under --two-level --checkpoint, interrupted
    by --maxiter, resumes from the .npz to the same trajectory."""
    import tpucg
    from tpucg.io.generator import fem_p1_system

    A, b, _ = fem_p1_system(4_000, seed=5)
    amtx = str(tmp_path / "F.mtx")
    bmtx = str(tmp_path / "fb.mtx")
    tpucg.save_matrix_market(amtx, A.to_coo(), symmetric=True)
    tpucg.save_matrix_market(bmtx, b)
    ck = str(tmp_path / "ck.npz")
    tol = 1e-3 * float(np.linalg.norm(b))  # above the FEM true floor

    # Uninterrupted reference through the same CLI path.
    rc = main(["solve", amtx, bmtx, "--tol", str(tol), "--two-level", "32",
               "--checkpoint", str(tmp_path / "ref.npz"),
               "--output", str(tmp_path / "xref.txt")])
    out = capsys.readouterr().out
    assert rc == 0, out
    iters_ref = int(out.split("iterations           : ")[1].split()[0])
    assert iters_ref > 16

    # Interrupted run: maxiter caps mid-solve, checkpoint is retained.
    rc = main(["solve", amtx, bmtx, "--tol", str(tol), "--two-level", "32",
               "--maxiter", "16", "--checkpoint", ck])
    out = capsys.readouterr().out
    assert rc == 3, out
    assert "checkpoint retained" in out
    assert os.path.exists(ck)

    # Resume to convergence; same lap count, same solution.
    rc = main(["solve", amtx, bmtx, "--tol", str(tol), "--two-level", "32",
               "--checkpoint", ck, "--output", str(tmp_path / "x.txt")])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert int(out.split("iterations           : ")[1].split()[0]) == iters_ref
    assert not os.path.exists(ck)
    x = load_vector(str(tmp_path / "x.txt"), n=A.shape[0])
    xref = load_vector(str(tmp_path / "xref.txt"), n=A.shape[0])
    np.testing.assert_array_equal(x, xref)


def test_solve_mtx_well_bf16(tmp_path, capsys):
    # Irregular .mtx (WELL promotion) with --storage bf16.
    import tpucg
    from tpucg.io.generator import random_geometric_spd

    A, b, _ = random_geometric_spd(600, seed=62, avg_degree=8.0)
    amtx = str(tmp_path / "G.mtx")
    bmtx = str(tmp_path / "gb.mtx")
    tpucg.save_matrix_market(amtx, A.to_coo(), symmetric=True)
    tpucg.save_matrix_market(bmtx, b)
    tol = 1e-3 * float(np.linalg.norm(b))
    rc = main(["solve", amtx, bmtx, "--storage", "bf16",
               "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "WellOperator+bf16" in out and "converged            : True" in out


def test_solve_mtx_irregular_sharded_and_block_jacobi(tmp_path, capsys):
    """Irregular (WELL-promoted) .mtx end-to-end through the CLI: the
    sharded strategies must hand the source CSR to the sharded WELL
    decomposition (a serial WellOperator pack is not re-shardable), and
    --precondition block_jacobi must thread pc_block_size into the
    operator construction."""
    import tpucg
    from tpucg.io.generator import random_geometric_spd

    A, b, _ = random_geometric_spd(500, seed=13)
    amtx = str(tmp_path / "Airr.mtx")
    bmtx = str(tmp_path / "birr.mtx")
    tpucg.save_matrix_market(amtx, A.to_coo(), symmetric=True)
    tpucg.save_matrix_market(bmtx, b)
    tol = 1e-5 * float(np.linalg.norm(b))

    rc = main(["solve", amtx, bmtx, "--strategy", "allgather",
               "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "converged            : True" in out

    rc = main(["solve", amtx, bmtx, "--precondition", "block_jacobi",
               "--pc-block-size", "32", "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "converged            : True" in out

    rc = main(["solve", amtx, bmtx, "--strategy", "allgather",
               "--precondition", "block_jacobi", "--pc-block-size", "32",
               "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "converged            : True" in out


def test_info_spectrum_and_solve_interval(golden_files, capsys):
    # The reusable-interval flow: `info --spectrum` estimates the bounds,
    # `solve --interval LO HI` feeds them back so CA/Chebyshev skip their
    # per-solve power-method setup.
    pa, pb, px = golden_files
    rc = main(["info", "--spectrum", pa])
    out = capsys.readouterr().out
    assert rc == 0
    spec = json.loads(out)["spectrum"]
    assert spec["lam_hi"] >= spec["lam_lo"] > 0

    for method in ("ca", "chebyshev"):
        rc = main([
            "solve", pa, pb, px, "--method", method,
            "--interval", str(spec["lam_lo"]), str(spec["lam_hi"]),
            "--maxiter", "64",
        ])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "converged            : True" in out

    # Sharded dense path takes the same flag.
    rc = main([
        "solve", pa, pb, px, "--method", "ca", "--strategy", "allgather",
        "--interval", str(spec["lam_lo"]), str(spec["lam_hi"]),
        "--maxiter", "64",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "converged            : True" in out

    # Wrong method refuses loudly.
    with pytest.raises(ValueError, match="interval"):
        main(["solve", pa, pb, px, "--interval", "1.0", "2.0"])


def test_solve_mtx_two_level(tmp_path, capsys):
    # FEM-class .mtx through the two-level flag: fewer laps than jacobi,
    # serial and sharded WELL.
    import tpucg
    from tpucg.io.generator import random_geometric_spd

    A, b, _ = random_geometric_spd(6_000, seed=4, avg_degree=10.0,
                                   shift=0.05)
    amtx, bmtx = str(tmp_path / "A.mtx"), str(tmp_path / "b.mtx")
    tpucg.save_matrix_market(amtx, A.to_coo(), symmetric=True)
    tpucg.save_matrix_market(bmtx, b)
    tol = 1e-5 * float(np.linalg.norm(b))

    rc = main(["solve", amtx, bmtx, "--precondition", "jacobi",
               "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    jac_laps = int(out.split("iterations           : ")[1].split()[0])

    rc = main(["solve", amtx, bmtx, "--two-level", "64", "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "+2lvl64" in out
    tl_laps = int(out.split("iterations           : ")[1].split()[0])
    assert tl_laps < jac_laps

    rc = main(["solve", amtx, bmtx, "--two-level", "64",
               "--strategy", "allgather", "--tol", str(tol)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "converged            : True" in out


def test_solve_mtx_multilevel_coarse_max(tmp_path, capsys):
    # --two-level --coarse-max: the multilevel hierarchy through the CLI.
    import tpucg
    from tpucg.io.generator import fem_p1_system

    A, b, _ = fem_p1_system(4_000, seed=7)
    amtx = str(tmp_path / "M.mtx")
    bmtx = str(tmp_path / "mb.mtx")
    tpucg.save_matrix_market(amtx, A.to_coo(), symmetric=True)
    tpucg.save_matrix_market(bmtx, b)
    tol = 1e-3 * float(np.linalg.norm(b))  # above the FEM true floor
    rc = main(["solve", amtx, bmtx, "--tol", str(tol),
               "--two-level", "8", "--coarse-max", "64"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "+2lvl8x" in out and "lv]" in out  # e.g. +2lvl8x2lv
    assert "converged            : True" in out
