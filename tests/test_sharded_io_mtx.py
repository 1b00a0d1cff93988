"""Host-sharded .mtx loading for the irregular (WELL) path — VERDICT r4 #2.

The reference's scalability ceiling is rank 0 reading ALL of A
(``parallel_cg.c:100-108``); round 4 removed it for dense text but
re-created it on the flagship sparse path (``load_matrix_market`` parsed
the whole file on every host, ``csr_to_well_sharded`` packed the whole
CSR). These tests pin the replacement machinery end-to-end on the forced
CPU mesh: sidecar byte-offset index, per-row-block byte-range reads,
per-shard WELL packing from local rows only, distributed two-level
assembly, and solve parity with the everything-on-one-host path.
The per-PROCESS bytes-read bound is asserted by the multi-process arm
(tests/test_multiprocess.py).
"""

import os

import numpy as np
import pytest

import tpucg
from tpucg.io import mmio
from tpucg.io.generator import fem_p1_system, random_geometric_spd


@pytest.fixture(scope="module")
def mtx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mtx")
    A, b, _ = fem_p1_system(6_000, seed=2)
    src = str(d / "A_sym.mtx")
    dst = str(d / "A.mtx")
    tpucg.save_matrix_market(src, A.to_coo(), symmetric=True)
    mmio.expand_matrix_market(src, dst)
    np.save(str(d / "b.npy"), b)
    return dict(A=A, b=b, dst=dst, bpath=str(d / "b.npy"), dir=d)


def test_index_and_row_range_reads(mtx_dir):
    A, dst = mtx_dir["A"], mtx_dir["dst"]
    n = A.shape[0]
    total = os.path.getsize(dst)
    x = np.random.default_rng(0).standard_normal(n)
    # reassemble from 4 disjoint row blocks; each reads ~1/4 of the bytes
    parts, bytes_sum = [], 0
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        coo, shape, br = mmio.load_matrix_market_rows(
            dst, bounds[i], bounds[i + 1]
        )
        assert br < 0.6 * total  # strictly partial reads
        parts.append((bounds[i], coo))
        bytes_sum += br
    assert bytes_sum <= total
    from tpucg.sparse.formats import COOMatrix

    re = COOMatrix(
        row=np.concatenate([r0 + c.row for r0, c in parts]),
        col=np.concatenate([c.col for _, c in parts]),
        data=np.concatenate([c.data for _, c in parts]),
        shape=shape,
    ).to_csr()
    np.testing.assert_allclose(re.matvec(x), A.matvec(x), rtol=1e-6)


def test_index_refuses_symmetric_and_unsorted(tmp_path):
    A, _, _ = random_geometric_spd(500, seed=1, avg_degree=6.0)
    sym = str(tmp_path / "s.mtx")
    tpucg.save_matrix_market(sym, A.to_coo(), symmetric=True)
    with pytest.raises(ValueError, match="symmetric"):
        mmio.build_mm_index(sym)
    # unsorted general file
    coo = A.to_coo()
    order = np.random.default_rng(0).permutation(coo.row.size)
    from tpucg.sparse.formats import COOMatrix

    shuf = COOMatrix(row=coo.row[order], col=coo.col[order],
                     data=coo.data[order], shape=coo.shape)
    uns = str(tmp_path / "u.mtx")
    tpucg.save_matrix_market(uns, shuf, symmetric=False)
    with pytest.raises(ValueError, match="row-sorted"):
        mmio.build_mm_index(uns)
    # missing sidecar is a loud FileNotFoundError
    with pytest.raises(FileNotFoundError, match="mmidx"):
        mmio.load_matrix_market_rows(uns, 0, 10)


def test_load_well_system_sharded_solves(mtx_dir):
    from tpucg.solver.sharded import (
        load_well_system_sharded,
        sharded_operator_cg_solve,
    )

    A, b = mtx_dir["A"], mtx_dir["b"]
    n = A.shape[0]
    mesh = tpucg.make_mesh()
    sys_ = load_well_system_sharded(
        mtx_dir["dst"], mtx_dir["bpath"], mesh=mesh, two_level_agg=64,
    )
    assert sys_.n == n and sys_.npad % mesh.devices.size == 0
    assert sys_.bytes_read > 0
    # above the n=6k FEM TRUE-residual floor (round-5 honest stopping;
    # measured stagnation at ~1.07e-3 ||b|| on this seed)
    tol = 2e-3 * float(np.linalg.norm(b))
    res = sharded_operator_cg_solve(
        sys_, mesh=mesh, tol=tol, maxiter=4 * n,
        two_level=sys_.two_level,
    )
    assert bool(res.converged)
    x = np.asarray(res.x)[:n]
    # the f32 PCG recurrence-vs-true gap on FEM is O(100x) at this
    # conditioning (RESULTS.md deflation floor notes); the load-path
    # correctness signal is the parity check below.
    true_r = np.linalg.norm(b - A.matvec(x.astype(np.float64)))
    assert true_r <= 2 * tol  # converged now MEANS the true residual

    # parity with the everything-on-one-host path (same decomposition)
    ref = sharded_operator_cg_solve(
        A, b, mesh=mesh, tol=tol, maxiter=4 * n, two_level=sys_.two_level,
    )
    # same decomposition; counts quantize to the 16-lap true-check
    assert abs(int(res.iterations) - int(ref.iterations)) <= 16
    np.testing.assert_allclose(x, np.asarray(ref.x)[:n], rtol=2e-2,
                               atol=1e-4)


def test_load_well_system_sharded_jacobi_and_pipelined(mtx_dir):
    from tpucg.solver.sharded import (
        load_well_system_sharded,
        sharded_operator_cg_solve,
    )

    A, b = mtx_dir["A"], mtx_dir["b"]
    n = A.shape[0]
    mesh = tpucg.make_mesh()
    sys_ = load_well_system_sharded(mtx_dir["dst"], mtx_dir["bpath"],
                                    mesh=mesh)
    tol = 1e-4 * float(np.linalg.norm(b))
    res_j = sharded_operator_cg_solve(
        sys_, mesh=mesh, tol=tol, maxiter=4 * n, precondition="jacobi",
    )
    assert bool(res_j.converged)
    # the full composition: host-sharded load + two-level + pipelined
    sys2 = load_well_system_sharded(mtx_dir["dst"], mtx_dir["bpath"],
                                    mesh=mesh, two_level_agg=64)
    # tolerance sits above the pipelined f32 floor on this FEM system
    # (~2e-3 ||b|| measured) — the test pins the load-path COMPOSITION
    res_p = sharded_operator_cg_solve(
        sys2, mesh=mesh, tol=5e-3 * float(np.linalg.norm(b)),
        maxiter=4 * n, two_level=sys2.two_level, method="pipelined",
    )
    assert bool(res_p.converged)


def test_two_level_from_parts_matches_full_build(mtx_dir):
    from tpucg.solver.twolevel import build_two_level, build_two_level_from_parts

    A = mtx_dir["A"]
    n = A.shape[0]
    num = 8
    from tpucg.sparse.well import LANE

    rps = -(-n // (num * LANE)) * LANE
    npad = num * rps
    parts = []
    for s in range(num):
        r0, r1 = s * rps, min(n, (s + 1) * rps)
        if r1 <= r0:
            continue
        coo, _, _ = mmio.load_matrix_market_rows(mtx_dir["dst"], r0, r1)
        parts.append((r0, coo))
    tl_parts = build_two_level_from_parts(parts, n=n, npad=npad,
                                          agg_size=64)
    tl_full = build_two_level(A, agg_size=64, npad=npad)
    np.testing.assert_allclose(
        np.asarray(tl_parts.acinv), np.asarray(tl_full.acinv),
        rtol=1e-4, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(tl_parts.dinv), np.asarray(tl_full.dinv), rtol=1e-6
    )
