#!/usr/bin/env python
"""Driver benchmark: dense CG solve, reference's flagship n=8192 workload.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}

Baseline: the reference's serial CG-phase time at n=8192 is 0.562 s
(results.xlsx sheet2 C9; BASELINE.md). The workload is the same family —
generateSPDmatrix.m-style random dense SPD, float32, tol 1e-6 — solved here
as one jitted while_loop with the Pallas GEMV on a single TPU chip.
``vs_baseline`` is the speedup factor (baseline seconds / our seconds).

Methodology: the headline value is steady-state per-solve time, measured by
chaining K full CG solves inside ONE dispatched program (a traced zero makes
each solve data-depend on the previous, so XLA cannot CSE them) and
differencing two chain lengths — this cancels the remote-tunnel's ~20-30 ms
per-dispatch round trip, mirroring how the reference fences only its CG phase
with MPI_Wtime (parallel_cg.c:278-279) and not process overheads. The
single-dispatch end-to-end time (RTT included) is reported alongside on
stderr.

Diagnostics (roofline, phase split) go to stderr.
"""

import json
import os
import sys
import time

N = int(os.environ.get("TPUCG_BENCH_N", "8192"))
BASELINE_S = {512: 0.005, 1024: 0.016, 2048: 0.039, 4096: 0.186, 8192: 0.562}


def main():
    import jax
    import numpy as np

    import tpucg
    from tpucg.bench.timing import BenchReport, time_fn
    from tpucg.kernels.dispatch import resolve_backend
    from tpucg.solver.operators import DenseOperator

    backend = resolve_backend("auto")
    t_total0 = time.perf_counter()
    A, b, x0 = tpucg.generate_spd_system(N, seed=0)

    # Distribution phase: host -> device placement of the padded operator
    # (the reference's MPI_Scatter phase, parallel_cg.c:109-117).
    t0 = time.perf_counter()
    op = DenseOperator.create(A, backend=backend)
    bj = jax.device_put(jax.numpy.asarray(b))
    x0j = jax.device_put(jax.numpy.asarray(x0))
    jax.block_until_ready(op.A)
    distribute_s = time.perf_counter() - t0

    solve = lambda: tpucg.cg_solve(op, bj, x0j)
    res = solve()  # compile + first run
    iters = int(res.iterations)
    rnorm = float(res.residual_norm)
    solve_e2e_s = time_fn(lambda: solve().x, warmup=1, iters=5)

    # Steady-state per-solve time: chain K data-dependent solves in one
    # dispatch and difference two chain lengths (see module docstring).
    from tpucg.bench.timing import hbm_peak_bytes_per_s, time_solve_chain

    npad = op.padded_n
    b_pad = bj if npad == N else jax.numpy.pad(bj, (0, npad - N))
    x0_pad = x0j if npad == N else jax.numpy.pad(x0j, (0, npad - N))
    est = iters * 4.0 * npad ** 2 / hbm_peak_bytes_per_s()
    solve_s = time_solve_chain(
        op, b_pad, x0_pad, maxiter=N, blas_backend=backend, est_solve_s=est
    )

    # Isolated hot-kernel timing for the roofline number (dispatch-corrected).
    from tpucg.bench.timing import auto_steps, time_matvec_loop

    v0 = bj if op.padded_n == N else jax.numpy.pad(bj, (0, op.padded_n - N))
    matvec_s = time_matvec_loop(
        lambda o, v: o.matvec(v), op, v0, steps=auto_steps(op.padded_n)
    )

    total_s = time.perf_counter() - t_total0
    report = BenchReport(
        n=N,
        iterations=iters,
        residual_norm=rnorm,
        distribute_s=distribute_s,
        solve_s=solve_s,
        total_s=total_s,
        matvec_s=matvec_s,
        strategy="serial",
        backend=backend,
    ).finalize()
    print(report.pretty(), file=sys.stderr)
    print(
        f"solve (single dispatch, tunnel RTT incl.): {solve_e2e_s:.6f} s",
        file=sys.stderr,
    )

    baseline = BASELINE_S.get(N)
    out = {
        "metric": f"dense_cg_solve_time_n{N}",
        "value": round(solve_s, 6),
        "unit": "s",
        "vs_baseline": round(baseline / solve_s, 2) if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
