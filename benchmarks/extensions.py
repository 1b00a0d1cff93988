#!/usr/bin/env python
"""Extension benchmarks beyond the reference's matrix -> RESULTS.md section.

- bfloat16 matrix storage (f32 accumulation): halves HBM traffic on the
  bandwidth-bound GEMV -> ~2x steady-state solve speed at n=8192.
- Beyond-reference scale: n=16384 (1 GB matrix; the reference's compile-time
  #define tops out at n=8192).

Appends/replaces an "## Extensions" section in RESULTS.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import _ledger

MARK = "## Extensions (beyond the reference)"


def bench_config(n, storage_dtype, repeats):
    import jax
    import jax.numpy as jnp

    import tpucg
    from tpucg.bench.timing import (
        auto_steps,
        hbm_peak_bytes_per_s,
        time_matvec_loop,
        time_solve_chain,
    )
    from tpucg.kernels.dispatch import resolve_backend
    from tpucg.solver.operators import DenseOperator

    backend = resolve_backend("auto")
    if n > 16384:
        # Memory-lean f32 generation (the f64 path peaks ~100 GB at
        # n=65536); convert to bf16 host-side so the tunnel moves 2 bytes
        # per element instead of 4.
        from tpucg.io.generator import generate_spd_system_f32

        A, b, x0 = generate_spd_system_f32(n, seed=0)
        if storage_dtype in ("bfloat16", jnp.bfloat16):
            import ml_dtypes

            A = A.astype(ml_dtypes.bfloat16)
    else:
        A, b, x0 = tpucg.generate_spd_system(n, seed=0)
    op = DenseOperator.create(A, backend=backend, dtype=storage_dtype)
    del A
    bj = jax.device_put(jnp.asarray(b))
    x0j = jax.device_put(jnp.asarray(x0))
    jax.tree_util.tree_map(jax.block_until_ready, (op.A, bj))
    npad = op.padded_n
    bp = bj if npad == n else jnp.pad(bj, (0, npad - n))
    xp = x0j if npad == n else jnp.pad(x0j, (0, npad - n))

    # bf16-rounded systems cannot reliably reach the absolute 1e-6 floor
    # (tests/test_dtype.py); scale the tolerance to ||b|| so the timed solve
    # is a genuinely converged one.
    import numpy as np

    tol = 1.0e-6 if storage_dtype == "float32" else 1.0e-5 * float(
        np.linalg.norm(b)
    )
    res = tpucg.cg_solve(op, bj, x0j, tol=tol, maxiter=4 * n)
    iters = int(res.iterations)
    assert bool(res.converged), (n, storage_dtype, iters)
    itemsize = jnp.dtype(storage_dtype).itemsize
    bytes_per_mv = itemsize * npad * npad
    est = iters * bytes_per_mv / hbm_peak_bytes_per_s()
    solve_s = time_solve_chain(
        op, bp, xp, maxiter=4 * n, blas_backend=backend, iters=repeats,
        est_solve_s=est, tol=tol,
    )
    mv_s = time_matvec_loop(
        lambda o, v: o.matvec(v), op, bp,
        steps=auto_steps(npad) * (4 // itemsize if itemsize < 4 else 1),
    )
    gbps = bytes_per_mv / mv_s / 1e9
    return dict(
        n=n, dtype=str(jnp.dtype(storage_dtype).name), iters=iters,
        rnorm=float(res.residual_norm), converged=bool(res.converged),
        solve_ms=solve_s * 1e3, matvec_ms=mv_s * 1e3, gbps=gbps,
        roofline=gbps * 1e9 / hbm_peak_bytes_per_s(),
    )


def bench_ir(n, repeats):
    """Mixed-precision IR vs plain f32 on a CONDITIONED system (~20-30 CG
    iterations, where iteration bandwidth dominates and bf16 inner solves pay
    off; the diag-dominant default converges in 4 laps and cannot amortize
    IR's per-round f32 residual matvec). Both arms solve to the same
    reachable tolerance (1e-5 * ||b||) and both report the TRUE f32 residual.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import (
        hbm_peak_bytes_per_s,
        time_fn,
        time_solve_chain,
    )
    from tpucg.kernels.dispatch import resolve_backend
    from tpucg.solver.ir import _ir_jit
    from tpucg.solver.operators import DenseOperator

    backend = resolve_backend("auto")
    A, b, x0 = tpucg.generate_spd_system(n, seed=0)
    # Shrink the diagonal shift n -> n/32: kappa ~ 20, ~25 CG laps, still
    # safely SPD (the symmetric-noise spectral radius is ~0.6*sqrt(n)).
    A = (A - (n - n / 32.0) * np.eye(n, dtype=np.float32)).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    op16 = DenseOperator.create(A, backend=backend, dtype=jnp.bfloat16)
    op32 = DenseOperator.create(A, backend=backend, dtype=jnp.float32)
    del A
    npad = op32.padded_n
    bj = jnp.pad(jnp.asarray(b), (0, npad - n)) if npad != n else jnp.asarray(b)
    xj = (
        jnp.pad(jnp.asarray(x0), (0, npad - n)) if npad != n
        else jnp.asarray(x0)
    )
    jax.tree_util.tree_map(jax.block_until_ready, (op16.A, op32.A, bj))

    # Arm 1: plain f32 CG on the conditioned system.
    res32 = tpucg.cg_solve(op32, bj[:n] if npad != n else bj, tol=tol,
                           maxiter=4 * n)
    it32 = int(res32.iterations)
    est32 = it32 * 4.0 * npad * npad / hbm_peak_bytes_per_s()
    s32 = time_solve_chain(op32, bj, xj, tol=tol, maxiter=4 * n,
                           blas_backend=backend, iters=repeats,
                           est_solve_s=est32)

    # Arm 2: IR (bf16 inner).
    run_args = (tol, 3.0e-2, n, 6, backend)
    res = _ir_jit(op16, op32, bj, xj, *run_args)
    iters = int(res.iterations)
    rnorm = float(res.residual_norm)
    conv = bool(res.converged)

    def ir_run(operands, bb, x0_):
        o16, o32 = operands
        return _ir_jit(o16, o32, bb, x0_, *run_args).x

    from tpucg.bench.timing import time_run_chain

    est = iters * 2.0 * npad * npad / hbm_peak_bytes_per_s()
    solve_s = time_run_chain(
        ir_run, (op16, op32), bj, xj, iters=repeats, est_solve_s=est
    )
    nanrow = dict(matvec_ms=float("nan"), gbps=float("nan"),
                  roofline=float("nan"))
    return [
        dict(n=n, dtype="f32 (kappa~20)", iters=it32,
             rnorm=float(res32.residual_norm), converged=bool(res32.converged),
             solve_ms=s32 * 1e3, **nanrow),
        dict(n=n, dtype="bf16+IR (kappa~20)", iters=iters, rnorm=rnorm,
             converged=conv, solve_ms=solve_s * 1e3, **nanrow),
    ]


def bench_batch(nsys, n, repeats):
    """Batched independent-systems throughput (cg_solve_batch): the serving
    extension. Three arms, same (nsys, n) reference-recipe SPD batch:
    scan-of-singles (one fused kernel launch per system — the per-launch
    floor), the Pallas grid whole-batch kernel (ONE launch, VMEM solves
    pipelined against the next system's HBM prefetch), and the vmapped XLA
    while_loop (per-lap batched MXU GEMM)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.kernels.fused import (
        fused_batch_cg_solve_pallas,
        fused_cg_solve_pallas,
    )
    from tpucg.solver.cg import _cg_batch_jit

    rng = np.random.default_rng(0)
    M = rng.standard_normal((nsys, n, n)).astype(np.float32)
    As = 0.5 * (M + M.transpose(0, 2, 1)) + n * np.eye(n, dtype=np.float32)
    del M
    bs = rng.standard_normal((nsys, n)).astype(np.float32)
    Aj = jax.device_put(jnp.asarray(As))
    del As
    bj = jax.device_put(jnp.asarray(bs))
    x0 = jnp.zeros_like(bj)
    jax.tree_util.tree_map(jax.block_until_ready, (Aj, bj))

    res = tpucg.cg_solve_batch(Aj, bj)
    its = np.asarray(res.iterations)
    assert bool(np.all(np.asarray(res.converged))), "batch must converge"
    iters = int(its.max())

    def run_grid(operands, bb, x0_):
        (A_,) = operands
        x, _, _ = fused_batch_cg_solve_pallas(A_, bb, x0_, tol=1e-6,
                                              maxiter=n)
        return x

    def run_scan(operands, bb, x0_):
        (A_,) = operands

        def one(carry, inp):
            Ai, bi, xi = inp
            x, _, _ = fused_cg_solve_pallas(Ai, bi, xi, tol=1e-6, maxiter=n)
            return carry, x

        _, xs = jax.lax.scan(one, 0, (A_, bb, x0_))
        return xs

    def run_xla(operands, bb, x0_):
        (A_,) = operands
        return _cg_batch_jit(A_, bb, x0_, None, 1e-6, n, True).x

    rows = []
    for label, run, est_per in (
        ("scan-of-singles (pallas)", run_scan, 25e-6),
        ("batched grid kernel (pallas)", run_grid, 10e-6),
        ("vmapped while_loop (xla)", run_xla, 15e-6),
    ):
        s = float(np.median([
            time_run_chain(run, (Aj,), bj, x0, iters=repeats,
                           est_solve_s=nsys * est_per)
            for _ in range(3)
        ]))
        rows.append(dict(method=label, nsys=nsys, n=n, iters=iters,
                         batch_ms=s * 1e3, solves_per_s=nsys / s))
        print(f"batch[{label}]: {s*1e3:.3f} ms/batch "
              f"({nsys/s:.0f} solves/s)", flush=True)

    # BANDED battery (cg_solve_batch_banded): nsys tridiagonal systems of
    # n=1024 through the batched whole-solve DIA kernel — the implicit-PDE
    # time-stepping serving shape.
    from tpucg.kernels.fused import fused_batch_dia_cg_solve_pallas
    from tpucg.kernels.spmv import dia_interleave

    nb = 1024
    data = np.zeros((nsys, 3, nb), np.float32)
    offd = rng.uniform(0.2, 1.0, (nsys, nb)).astype(np.float32)
    data[:, 0] = offd
    data[:, 2] = offd
    data[:, 1] = 4.0 + rng.uniform(0, 1, (nsys, nb)).astype(np.float32)
    bd = rng.standard_normal((nsys, nb)).astype(np.float32)
    resd = tpucg.cg_solve_batch_banded(data, (-1, 0, 1), bd, tol=1e-5)
    assert bool(np.all(np.asarray(resd.converged)))
    iters_d = int(np.asarray(resd.iterations).max())
    data_il = jnp.asarray(np.stack(
        [np.asarray(dia_interleave(data[i])) for i in range(nsys)]
    ))
    bdj = jax.device_put(jnp.asarray(bd))
    x0d = jnp.zeros_like(bdj)

    def run_dia(operands, bb, x0_):
        (d_,) = operands
        x, _, _ = fused_batch_dia_cg_solve_pallas(
            d_, (-1, 0, 1), bb, x0_, tol=1e-5, maxiter=nb)
        return x

    s = float(np.median([
        time_run_chain(run_dia, (data_il,), bdj, x0d, iters=repeats,
                       est_solve_s=nsys * 3e-6)
        for _ in range(3)
    ]))
    rows.append(dict(
        method="banded battery, tridiag n=1024 (batched DIA kernel)",
        nsys=nsys, n=nb, iters=iters_d, batch_ms=s * 1e3,
        solves_per_s=nsys / s,
    ))
    print(f"batch[banded-dia]: {s*1e3:.3f} ms/batch "
          f"({nsys/s:.0f} solves/s)", flush=True)
    return rows


def bench_block(n, k, repeats):
    """TRUE block CG vs the independent-lane alternatives on a spread
    spectrum (UNSHIFTED 1-D Laplacian, lambda_j ~ j^2 — the regime where
    shared block-Krylov deflation pays; see the shift warning at the
    matrix construction below): one (A, B) problem, three arms — k
    sequential single-vector solves, the vmapped lockstep multi solver,
    and BCGrQ block CG."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.solver.cg import _cg_block_jit, _cg_jit, _cg_multi_jit
    from tpucg.solver.operators import as_operator

    # UNSHIFTED Laplacian: its low modes are quadratically SPREAD
    # (lambda_j ~ j^2), exactly where deflating the k lowest pays ~k-fold;
    # a shift s >> pi^2/n^2 would cluster them at s and erase the win
    # (measured: +4e-3 shift left block at 127 vs 153 lockstep laps).
    A = (2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(
        np.float32)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, k)).astype(np.float32)
    # 3e-4 ||b||: safely above the f32 true-residual floor at this kappa
    # (1e-4 ||b|| leaves two columns floor-accepted at ~1.2e-4 ||b||).
    tol = 3e-4 * float(np.linalg.norm(B[:, 0]))
    maxiter = 4 * n
    op = as_operator(jnp.asarray(A), backend="xla")
    Bj = jax.device_put(jnp.asarray(B))
    X0 = jnp.zeros_like(Bj)
    jax.block_until_ready((op.A, Bj))

    res_b = tpucg.cg_solve_block(A, B, tol=tol, maxiter=maxiter)
    assert np.asarray(res_b.converged).all()
    res_m = tpucg.cg_solve_multi(A, B, tol=tol, maxiter=maxiter)
    assert np.asarray(res_m.converged).all()

    def run_block(operands, bb, x0_):
        (op_,) = operands
        return _cg_block_jit(op_, bb, x0_, tol, maxiter).x

    def run_multi(operands, bb, x0_):
        (op_,) = operands
        return _cg_multi_jit(op_, bb, x0_, None, tol, maxiter, True).x

    def run_singles(operands, bb, x0_):
        (op_,) = operands
        cols = []
        for j in range(k):
            cols.append(
                _cg_jit(op_, bb[:, j], x0_[:, j], None, tol, maxiter,
                        "xla", True).x
            )
        return jnp.stack(cols, axis=1)

    rows = []
    iters_map = {
        "block-cg (BCGrQ)": int(res_b.iterations),
        "multi (vmap lockstep)": int(np.asarray(res_m.iterations).max()),
        "k sequential solves": int(np.asarray(res_m.iterations).max()),
    }
    for label, run, est in (
        ("block-cg (BCGrQ)", run_block,
         int(res_b.iterations) * 3 * 50e-6),
        ("multi (vmap lockstep)", run_multi,
         int(np.asarray(res_m.iterations).max()) * 50e-6),
        ("k sequential solves", run_singles,
         k * int(np.asarray(res_m.iterations).max()) * 30e-6),
    ):
        s = float(np.median([
            time_run_chain(run, (op,), Bj, X0, iters=repeats,
                           est_solve_s=est)
            for _ in range(3)
        ]))
        rows.append(dict(method=label, n=n, k=k, iters=iters_map[label],
                         solve_ms=s * 1e3))
        print(f"block[{label}]: {s*1e3:.3f} ms ({iters_map[label]} laps)",
              flush=True)
    return rows


def bench_block_well(n_points, k, repeats):
    """Block CG / multi-RHS on the IRREGULAR (WELL) operator — the
    VERDICT round-3 item-3 ask ("dense AND WELL"): one geometric-graph
    Laplacian (the irregular solve table's own workload — an
    unpreconditioned FEM stiffness does NOT converge inside the watchdog
    clamp below) with k random right-hand sides.

    Kernel contrast first (the round-4 design story): k sequential
    single-RHS kernel applies vs the batched apply
    (``WellOperator.matvec_multi`` = ``vmap`` of the kernel, whose
    Mosaic batching makes the lane axis the minor grid dimension and
    elides repeated block fetches — measured FASTER on chip than a
    hand-fused scratch SpMM at every size tried; see
    ``kernels/gather_spmv.py``'s module note). Solver arms ride the
    batched apply (``multi_cg_loop`` matrix-form lockstep, BCGrQ block
    CG) vs k sequential single-vector solves."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.io.generator import random_geometric_spd
    from tpucg.solver.cg import _cg_block_jit, _cg_jit, _cg_multi_jit

    A, _, _ = random_geometric_spd(n_points, seed=0, avg_degree=12.0)
    n = A.shape[0]
    op = tpucg.WellOperator.from_csr(A)
    npad = op.padded_n
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, k)).astype(np.float32)
    Bp = np.zeros((npad, k), np.float32)
    Bp[:n] = B
    tol = 1e-5 * float(np.linalg.norm(B[:, 0]))
    # Watchdog clamp (CLAUDE.md rule 6, learned AGAIN here: a
    # non-converging maxiter=4n WELL solve in one dispatch crashed the
    # TPU worker): cap laps well under the single-dispatch limit and
    # assert convergence instead.
    maxiter = min(4 * n, 4096)
    Bj = jax.device_put(jnp.asarray(Bp))
    X0 = jnp.zeros_like(Bj)
    jax.block_until_ready((Bj,))

    rows = []

    def run_singles(operands, bb, x0_):
        (op_,) = operands
        cols = []
        for j in range(k):
            cols.append(
                _cg_jit(op_, bb[:, j], x0_[:, j], None, tol, maxiter,
                        "xla", True).x
            )
        return jnp.stack(cols, axis=1)

    # Sequential reference first (always available).
    res_1 = _cg_jit(op, Bj[:, 0], X0[:, 0], None, tol, maxiter, "xla",
                    True)
    assert bool(res_1.converged), "single WELL solve hit the lap clamp"
    seq_laps = int(res_1.iterations)
    mv_est = 80e-6  # measured WELL matvec at n=100k (chain sizing only)
    s_seq = float(np.median([
        time_run_chain(run_singles, (op,), Bj, X0, iters=repeats,
                       est_solve_s=k * seq_laps * mv_est)
        for _ in range(3)
    ]))
    rows.append(dict(method="k sequential solves", n=n, k=k,
                     iters=seq_laps, solve_ms=s_seq * 1e3))
    print(f"block-well[seq]: {s_seq*1e3:.3f} ms ({seq_laps} laps)",
          flush=True)

    # Kernel micro-contrast: k SEQUENTIAL kernel applies (one pallas_call
    # per RHS — the no-batching baseline) vs the batched apply
    # (matvec_multi = vmap minor-grid batching, where Mosaic elides
    # repeated block fetches). Both guarded — a Mosaic failure reports
    # and moves on.
    def run_mv_seq(operands, bb, x0_):
        (op_,) = operands
        return jnp.stack(
            [op_.matvec(bb[:, j]) for j in range(k)], axis=1
        )

    def run_mv_batched(operands, bb, x0_):
        (op_,) = operands
        return op_.matvec_multi(bb)

    mv_rows = []
    for label, run in (
        (f"k={k} sequential single-RHS applies", run_mv_seq),
        (f"batched apply (matvec_multi, k={k})", run_mv_batched),
    ):
        try:
            jax.device_get(run((op,), Bj, X0))  # compile + Mosaic check
            s = float(np.median([
                time_run_chain(run, (op,), Bj, X0, iters=repeats,
                               est_solve_s=k * mv_est)
                for _ in range(3)
            ]))
            mv_rows.append(dict(method=label, us=s * 1e6))
            print(f"block-well-mv[{label}]: {s*1e6:.0f} us/apply",
                  flush=True)
        except Exception as e:
            mv_rows.append(dict(
                method=f"{label} — FAILED ({type(e).__name__})",
                us=float("nan")))
            print(f"block-well-mv[{label}] FAILED: {e}", flush=True)

    def run_multi(operands, bb, x0_):
        (op_,) = operands
        return _cg_multi_jit(op_, bb, x0_, None, tol, maxiter, True).x

    def run_block(operands, bb, x0_):
        (op_,) = operands
        return _cg_block_jit(op_, bb, x0_, tol, maxiter).x

    for label, solve_fn, run in (
        ("multi (batched-kernel lockstep)",
         lambda: _cg_multi_jit(op, Bj, X0, None, tol, maxiter, True),
         run_multi),
        ("block-cg (BCGrQ, batched kernel)",
         lambda: _cg_block_jit(op, Bj, X0, tol, maxiter),
         run_block),
    ):
        try:
            res = solve_fn()
            conv = np.asarray(jax.device_get(res.converged))
            assert conv.all(), (label, conv)
            iters = int(np.asarray(res.iterations).max())
            mult = 3 if "block" in label else 1
            s = float(np.median([
                time_run_chain(run, (op,), Bj, X0, iters=repeats,
                               est_solve_s=iters * mult * mv_est)
                for _ in range(3)
            ]))
            rows.append(dict(method=label, n=n, k=k, iters=iters,
                             solve_ms=s * 1e3))
            print(f"block-well[{label}]: {s*1e3:.3f} ms ({iters} laps)",
                  flush=True)
        except Exception as e:  # Mosaic batching failure: report it
            rows.append(dict(method=f"{label} — FAILED ({type(e).__name__})",
                             n=n, k=k, iters=0, solve_ms=float("nan")))
            print(f"block-well[{label}] FAILED: {e}", flush=True)
    return rows, mv_rows


def bench_block_jacobi(n, repeats):
    """Block Jacobi where it structurally wins: a DENSE system (the
    matvec's n^2 streaming makes the n*bs block-inverse traffic free —
    on thin sparse operators the inverse stream would dominate the lap)
    whose conditioning lives INSIDE the diagonal blocks: a badly scaled
    near-singular band (D (2.05 I - band) D). Point Jacobi undoes only
    the scaling; block Jacobi also absorbs each block's band. Arms share
    the lap path (fused='never': the fused kernels don't know block
    GEMV preconds) so the delta is laps + one batched block GEMV."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.solver.cg import _cg_jit, block_jacobi_minv
    from tpucg.solver.operators import as_operator

    rng = np.random.default_rng(9)
    band = (2.05 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1))
    d = np.exp(rng.uniform(0.0, np.log(30.0), n))
    A = (band * d[:, None] * d[None, :]).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    # kappa(band) ~ 80: comfortably above trivial, comfortably inside the
    # f32 floor. All arms stop on the UNWEIGHTED true residual (the
    # single-vector PCG contract).
    tol = 1e-4 * float(np.linalg.norm(b))
    maxiter = 8 * n
    op = as_operator(jnp.asarray(A), backend="xla")
    minv_pt = jnp.where(jnp.diag(op.A) != 0, 1.0 / jnp.diag(op.A), 1.0)
    minv_bj = block_jacobi_minv(op, 64)
    bj_ = jax.device_put(jnp.asarray(b))
    x0 = jnp.zeros(n, jnp.float32)
    jax.block_until_ready((op.A, minv_pt, minv_bj))

    def run(operands, bb, x0_):
        op_ = operands[0]
        m = operands[1] if len(operands) > 1 else None
        return _cg_jit(op_, bb, x0_, m, tol, maxiter, "xla", True).x

    rows = []
    for label, operands, pre_kw in (
        ("plain CG", (op,), dict()),
        ("jacobi", (op, minv_pt), dict(precondition="jacobi")),
        ("block-jacobi bs=64", (op, minv_bj),
         dict(precondition="block_jacobi", pc_block_size=64)),
    ):
        res = tpucg.cg_solve(A, b, tol=tol, maxiter=maxiter, kernel="xla",
                             fused="never", **pre_kw)
        iters = int(res.iterations)
        s = float(np.median([
            time_run_chain(run, operands, bj_, x0,
                           iters=repeats, est_solve_s=iters * 100e-6)
            for _ in range(3)
        ]))
        rows.append(dict(method=label, n=n, iters=iters,
                         converged=bool(res.converged), solve_ms=s * 1e3))
        print(f"block-jacobi[{label}]: {s*1e3:.3f} ms ({iters} laps, "
              f"conv {bool(res.converged)})", flush=True)
    return rows


def bench_block_precond(n, k, repeats):
    """Preconditioning x block CG composed (the round-2-late flexible
    paths): a badly diagonally scaled 1-D Laplacian (D L D, d log-uniform
    on [1, 30]) with k random right-hand sides. All arms stop on the SAME
    D^-1/2-weighted residual norm (Jacobi = exact symmetric
    equilibration; for this construction the equilibrated system is
    exactly L/2, so the arms are also directly comparable to the
    unscaled block table above):

    - block-cg + jacobi: the matrix-free-equilibration block path
      (`_cg_block_pjit`) on the SCALED operator — deflation and scaling
      repair composed;
    - multi + jacobi: vmapped lockstep lanes on the explicitly
      equilibrated matrix (independent search spaces);
    - k sequential jacobi solves on the equilibrated matrix.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.solver.cg import _cg_block_pjit, _cg_jit, _cg_multi_jit
    from tpucg.solver.operators import as_operator

    L = (2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(
        np.float32)
    rng = np.random.default_rng(7)
    d = np.exp(rng.uniform(0.0, np.log(30.0), n)).astype(np.float32)
    A = (L * d[:, None] * d[None, :]).astype(np.float32)
    B = rng.standard_normal((n, k)).astype(np.float32)
    sc = (1.0 / np.sqrt(np.diag(A))).astype(np.float32)
    # Same floor rationale as bench_block's 3e-4 (the weighted system IS
    # the Laplacian): stay above the f32 true-residual floor at this kappa.
    tol = 3e-4 * float(np.linalg.norm(sc * B[:, 0]))
    maxiter = 4 * n

    op = as_operator(jnp.asarray(A), backend="xla")
    minv = jax.device_put(jnp.asarray((1.0 / np.diag(A)).astype(np.float32)))
    op_hat = as_operator(jnp.asarray(sc[:, None] * A * sc[None, :]),
                         backend="xla")
    Bj = jax.device_put(jnp.asarray(B))
    Bhat = jax.device_put(jnp.asarray(sc[:, None] * B))
    X0 = jnp.zeros_like(Bj)
    jax.block_until_ready((op.A, op_hat.A, Bj, Bhat, minv))

    # Lap count from the SAME path the chain times (_cg_block_pjit, the
    # matrix-free equilibration) — the public cg_solve_block would take
    # the dense materialized shortcut, whose f32 trajectory (and hence
    # confirm/refute boundary) can differ by a lap.
    res_b = _cg_block_pjit(op, Bj, X0, minv, tol, maxiter)
    assert np.asarray(res_b.converged).all()
    res_m = _cg_multi_jit(op_hat, Bhat, X0, None, tol, maxiter, True)
    assert np.asarray(res_m.converged).all()

    def run_block(operands, bb, x0_):
        op_, minv_ = operands
        return _cg_block_pjit(op_, bb, x0_, minv_, tol, maxiter).x

    def run_multi(operands, bb, x0_):
        (op_,) = operands
        return _cg_multi_jit(op_, bb, x0_, None, tol, maxiter, True).x

    def run_singles(operands, bb, x0_):
        (op_,) = operands
        cols = []
        for j in range(k):
            cols.append(
                _cg_jit(op_, bb[:, j], x0_[:, j], None, tol, maxiter,
                        "xla", True).x
            )
        return jnp.stack(cols, axis=1)

    multi_laps = int(np.asarray(res_m.iterations).max())
    rows = []
    for label, run, operands, bb, iters, est in (
        ("block-cg + jacobi", run_block, (op, minv), Bj,
         int(res_b.iterations), int(res_b.iterations) * 3 * 50e-6),
        ("multi + jacobi (lockstep)", run_multi, (op_hat,), Bhat,
         multi_laps, multi_laps * 50e-6),
        ("k sequential jacobi solves", run_singles, (op_hat,), Bhat,
         multi_laps, k * multi_laps * 30e-6),
    ):
        s = float(np.median([
            time_run_chain(run, operands, bb, X0, iters=repeats,
                           est_solve_s=est)
            for _ in range(3)
        ]))
        rows.append(dict(method=label, n=n, k=k, iters=iters,
                         solve_ms=s * 1e3))
        print(f"block-pcg[{label}]: {s*1e3:.3f} ms ({iters} laps)",
              flush=True)
    return rows


def bench_precond(repeats):
    """In-kernel preconditioning on a system that actually needs it: a
    badly diagonally scaled banded SPD matrix (D A D, d log-uniform on
    [1, 30]) in DIA form. Three arms: fused plain CG (the iteration-count
    price of the scaling), fused Jacobi-PCG (the PCG recurrence entirely
    inside the whole-solve kernel — 1/diag sliced from the VMEM-resident
    slab, zero extra operands/launches), and the lap-path Jacobi-PCG
    (per-lap kernel launches)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.kernels.blas1 import dot_xla, fused_update
    from tpucg.kernels.fused import (
        fused_dia_cg_solve_pallas,
        fused_dia_supported,
    )
    from tpucg.solver.cg import cg_loop
    from tpucg.sparse.formats import DIAMatrix
    from tpucg.solver.operators import DiaOperator

    n = 262144
    offsets = (-512, -1, 0, 1, 512)
    rng = np.random.default_rng(5)
    d = np.exp(rng.uniform(0.0, np.log(30.0), n))
    data = np.zeros((len(offsets), n))
    for k, off in enumerate(offsets):
        if off == 0:
            # Base: 4.2 I minus four unit shifts -> spectrum in [0.2, 8.2];
            # the D A D scaling then inflates kappa by ~spread^2.
            data[k] = 4.2 * d * d
        else:
            lo, hi = max(0, -off), min(n, n - off)
            idx = np.arange(lo, hi)
            data[k, idx] = -d[idx] * d[idx + off]
    dia = DIAMatrix(offsets=np.asarray(offsets, np.int64),
                    data=data.astype(np.float32), shape=(n, n))
    dop = DiaOperator.from_dia(dia, backend="pallas")
    assert dop.interleaved and fused_dia_supported(dop.padded_n, dop.offsets)
    bs = rng.standard_normal(n).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(bs))
    bj = jax.device_put(jnp.asarray(bs))
    x0 = jnp.zeros(n, jnp.float32)
    minv = jax.device_put(jnp.asarray((1.0 / data[2]).astype(np.float32)))
    jax.tree_util.tree_map(jax.block_until_ready, (dop.data, bj, minv))

    maxiter = 8 * n

    def run_fused_plain(operands, bb, x0_):
        (op_,) = operands
        x, _, _ = fused_dia_cg_solve_pallas(
            op_.data, op_.offsets, bb, x0_, tol=tol, maxiter=maxiter)
        return x

    def run_fused_jacobi(operands, bb, x0_):
        (op_,) = operands
        x, _, _ = fused_dia_cg_solve_pallas(
            op_.data, op_.offsets, bb, x0_, tol=tol, maxiter=maxiter,
            precondition="jacobi")
        return x

    def run_lap_jacobi(operands, bb, x0_):
        op_, minv_ = operands
        import functools

        upd = functools.partial(fused_update, backend="xla")
        st = cg_loop(op_.matvec, dot_xla, upd, bb, x0_,
                     tol=tol, maxiter=maxiter,
                     precond=lambda r: minv_ * r)
        return st.x

    rows = []
    for label, run, operands, pre_kw, est_per_lap in (
        ("cg-fused (no precond)", run_fused_plain, (dop,), dict(), 4e-6),
        ("jacobi-pcg-fused", run_fused_jacobi, (dop,),
         dict(precondition="jacobi"), 4e-6),
        ("jacobi-pcg (lap path)", run_lap_jacobi, (dop, minv),
         dict(precondition="jacobi", fused="never"), 30e-6),
    ):
        res = tpucg.cg_solve(dop, bj, tol=tol, maxiter=maxiter,
                             kernel="pallas", **pre_kw)
        iters = int(res.iterations)
        assert bool(res.converged), (label, iters)
        s = float(np.median([
            time_run_chain(run, operands, bj, x0, iters=repeats,
                           est_solve_s=iters * est_per_lap)
            for _ in range(3)
        ]))
        rows.append(dict(method=label, n=n, iters=iters, solve_ms=s * 1e3,
                         iters_per_s=iters / s))
        print(f"precond[{label}]: {s*1e3:.3f} ms, {iters} iters "
              f"({iters/s:.0f} it/s)", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--skip-large", action="store_true",
        help="skip the n=32768/65536 scale points (minutes of host "
             "generation + transfer)",
    )
    args = ap.parse_args()

    configs = [(8192, "float32"), (8192, "bfloat16"), (16384, "float32")]
    if not args.skip_large:
        # BASELINE config-4 single-chip stand-ins: the largest dense solves
        # one v5e holds (f32 4.3 GB; bf16 8.6 GB of 16 GB HBM).
        configs += [(32768, "float32"), (65536, "bfloat16")]
    rows = []
    for n, dt in configs:
        t0 = time.time()
        r = bench_config(n, dt, args.repeats)
        rows.append(r)
        print(f"n={n} {dt}: solve {r['solve_ms']:.3f} ms ({r['iters']} iters, "
              f"conv {r['converged']}), matvec {r['matvec_ms']:.3f} ms "
              f"{r['gbps']:.0f} GB/s ({100*r['roofline']:.0f}%) "
              f"[{time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    for r in bench_ir(8192, args.repeats):
        rows.append(r)
        print(f"n=8192 {r['dtype']}: solve {r['solve_ms']:.3f} ms "
              f"({r['iters']} iters, conv {r['converged']}, "
              f"true ||r||={r['rnorm']:.2e}) [{time.time()-t0:.0f}s]",
              flush=True)
    batch_rows = bench_batch(256, 512, args.repeats)
    precond_rows = bench_precond(args.repeats)
    block_rows = bench_block(512, 8, args.repeats)
    block_pcg_rows = bench_block_precond(512, 8, args.repeats)
    bj_rows = bench_block_jacobi(8192, args.repeats)
    # LAST: a worker crash here (vmapped Pallas on real TPU is this
    # arm's exercise) must not lose the arms above.
    try:
        block_well_rows, block_well_mv_rows = bench_block_well(
            100_000, 8, args.repeats)
    except Exception as e:
        print(f"block-well arm failed: {e}", flush=True)
        block_well_rows = [dict(method=f"FAILED ({type(e).__name__})",
                                n=100_000, k=8, iters=0,
                                solve_ms=float("nan"))]
        block_well_mv_rows = []

    lines = [
        MARK,
        "",
        "Marked extensions — the reference is float32-only and tops out at "
        "its compile-time n=8192. bf16 rows store A in bfloat16 with f32 "
        "accumulation (the solve still satisfies the f32 stopping contract "
        "on the bf16-rounded system); GB/s is physical bytes streamed. "
        "n=32768 (f32, 4.3 GB) and n=65536 (bf16, 8.6 GB) are the largest "
        "dense solves one v5e chip holds — the single-chip stand-ins for "
        "BASELINE config 4's 8-chip n=65536 row. "
        "The `kappa~20` rows compare plain f32 CG with mixed-precision "
        "iterative refinement (`tpucg.cg_solve_ir`: bf16-rate inner solves, "
        "f32 true-residual refinement) on a conditioned system at the same "
        "reachable tolerance. Honest verdict: IR reaches true-residual "
        "targets that raw bf16 storage cannot, but on the reference's "
        "well-conditioned families its per-round f32 residual matvecs "
        "outweigh the bandwidth saving — it pays only on high-iteration "
        "(kappa >> 100) solves.",
        "",
        "| n | A storage | CG (ms/solve) | iters | converged | matVec (ms) "
        "| GB/s | % roofline |",
        "|---|---|---|---|---|---|---|---|",
    ]
    import math

    for r in rows:
        if math.isnan(r["matvec_ms"]):
            mv, gb, roof = "—", "—", "—"
        else:
            mv = f"{r['matvec_ms']:.3f}"
            gb = f"{r['gbps']:.0f}"
            roof = f"{100*r['roofline']:.0f}%"
        lines.append(
            f"| {r['n']} | {r['dtype']} | {r['solve_ms']:.3f} | {r['iters']} "
            f"| {r['converged']} | {mv} | {gb} | {roof} |"
        )
    lines += [
        "",
        "### Batched independent systems (`tpucg.cg_solve_batch`, serving "
        "throughput)",
        "",
        f"{batch_rows[0]['nsys']} independent reference-recipe SPD systems "
        f"of n={batch_rows[0]['n']} (converging in <= "
        f"{batch_rows[0]['iters']} laps each, tol 1e-6), solved "
        "concurrently. The reference runs one system per process; "
        "`scan-of-singles` pays one kernel launch per system, the batched "
        "grid kernel solves the whole batch in ONE Pallas launch (each "
        "system iterates in VMEM while the grid pipeline prefetches the "
        "next system's matrix from HBM), and the XLA arm vmaps the "
        "while_loop so every lap is one batched MXU GEMM.",
        "",
        "| method | batch (ms) | solves/s |",
        "|---|---|---|",
    ]
    for r in batch_rows:
        lines.append(
            f"| {r['method']} | {r['batch_ms']:.3f} "
            f"| {r['solves_per_s']:.0f} |"
        )
    lines += [
        "",
        "### In-kernel preconditioning (fused whole-solve PCG)",
        "",
        f"Badly diagonally scaled banded SPD system (D A D, d log-uniform "
        f"on [1, 30]), n={precond_rows[0]['n']}, 5 diagonals "
        "(offsets ±1, ±512), DIA form, tol 1e-5 ||b||. Jacobi undoes the "
        "scaling; the fused arm runs the FULL PCG recurrence inside the "
        "whole-solve Pallas kernel (1/diag sliced from the VMEM-resident "
        "slab — zero per-lap launches and zero extra operands), vs the "
        "lap path's per-lap kernel launches.",
        "",
        "| method | solve (ms) | iters | iters/s |",
        "|---|---|---|---|",
    ]
    for r in precond_rows:
        lines.append(
            f"| {r['method']} | {r['solve_ms']:.3f} | {r['iters']} "
            f"| {r['iters_per_s']:.0f} |"
        )
    lines += [
        "",
        "### TRUE block CG (`tpucg.cg_solve_block`, BCGrQ)",
        "",
        f"One 1-D Laplacian system (n={block_rows[0]['n']}, quadratically "
        "spread low modes) with "
        f"k={block_rows[0]['k']} random right-hand sides, tol 3e-4 ||b||. "
        "Block CG couples the k solves into ONE shared block-Krylov space "
        "(O'Leary, in Dubrulle's f32-stable rQ form: the residual block "
        "stays orthonormal via CholeskyQR2), deflating k eigendirections "
        "per lap — versus the vmapped lockstep multi solver (independent "
        "search spaces, laps = the worst lane) and k sequential "
        "single-vector solves.",
        "",
        "| method | solve (ms) | laps |",
        "|---|---|---|",
    ]
    for r in block_rows:
        lines.append(
            f"| {r['method']} | {r['solve_ms']:.3f} | {r['iters']} |"
        )
    lines += [
        "",
        "### Block CG / multi-RHS on the irregular (WELL) operator",
        "",
        f"One geometric-graph Laplacian (n={block_well_rows[0]['n']}, "
        f"WELL Pallas kernel) with k={block_well_rows[0]['k']} random "
        "right-hand sides, tol 1e-5 ||b||. Kernel contrast first: k "
        "sequential single-RHS applies vs the batched apply "
        "(`WellOperator.matvec_multi` = `vmap` of the kernel; Mosaic "
        "batches the lane axis as the MINOR grid dimension and elides "
        "repeated block fetches, so the vals/lidx stream amortizes "
        "across lanes). A hand-fused scratch SpMM (matrix streamed "
        "once, (k*128)-wide window gathers, one wide one-hot matmul) "
        "was built and measured SLOWER than the vmapped form at every "
        "size tried (450-488 vs 244-371 us at n=100k k=8; 614 vs 253 "
        "us/RHS at n=1M) and removed — the negative result is recorded "
        "in `kernels/gather_spmv.py`. The multi/block solver arms ride "
        "the batched apply via the matrix-form lockstep loop "
        "(`multi_cg_loop`).",
        "",
        "| batched matvec (k RHS, one apply) | us |",
        "|---|---|",
    ]
    for r in block_well_mv_rows:
        lines.append(f"| {r['method']} | {r['us']:.0f} |")
    lines += [
        "",
        "| method | solve (ms) | laps |",
        "|---|---|---|",
    ]
    for r in block_well_rows:
        lines.append(
            f"| {r['method']} | {r['solve_ms']:.3f} | {r['iters']} |"
        )
    lines += [
        "",
        "### Preconditioned block CG (jacobi x BCGrQ composed)",
        "",
        f"The same Laplacian badly diagonally scaled (D L D, d log-uniform "
        f"on [1, 30]; n={block_pcg_rows[0]['n']}, "
        f"k={block_pcg_rows[0]['k']}). All arms stop on the same "
        "D^-1/2-weighted residual (3e-4): jacobi block CG runs the "
        "matrix-free symmetric equilibration path on the scaled operator; "
        "the lockstep/sequential arms solve the explicitly equilibrated "
        "system. Deflation and scaling repair compose: the shared "
        "block-Krylov space keeps its ~7x lap cut despite the ~900x "
        "kappa inflation the scaling adds.",
        "",
        "| method | solve (ms) | laps |",
        "|---|---|---|",
    ]
    for r in block_pcg_rows:
        lines.append(
            f"| {r['method']} | {r['solve_ms']:.3f} | {r['iters']} |"
        )
    lines += [
        "",
        "### Block-Jacobi preconditioner (`precondition=\"block_jacobi\"`)",
        "",
        f"Dense badly scaled near-singular band (D (2.05 I - band) D, "
        f"n={bj_rows[0]['n']}, single RHS, tol 1e-4 ||b||), all arms on "
        "the lap path. Point Jacobi undoes the scaling only; block "
        "Jacobi's bs=64 inverted diagonal blocks (one batched block GEMV "
        "per lap, 2 MB streamed vs the 268 MB dense matvec) also absorb "
        "each block's band. On thin SPARSE operators the inverse stream "
        "would dominate the lap — dense/block-structured systems are "
        "where block Jacobi structurally wins.",
        "",
        "| method | solve (ms) | iters | converged |",
        "|---|---|---|---|",
    ]
    for r in bj_rows:
        lines.append(
            f"| {r['method']} | {r['solve_ms']:.3f} | {r['iters']} "
            f"| {r['converged']} |"
        )
    section = "\n".join(lines) + "\n"

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RESULTS.md",
    )
    _ledger.replace_section(out, MARK, section)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
