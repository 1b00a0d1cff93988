#!/usr/bin/env python
"""Deflated / recycling CG benchmark -> RESULTS.md section (run ON TPU).

The sequence-of-solves scenario the reference never faces (one system per
process, serialConjugate.c:43-73): a clustered-spectrum SPD operator —
three eigenvalues at 0.01/0.02/0.03 under a [1, 2] bulk, the structure
that makes plain CG crawl — solved (a) cold, (b) deflated with the three
known slow eigenvectors, (c) deflated with a basis recycled from three
previous solutions of a smooth b-sequence (the RecyclingCG state at its
fourth solve).

Appends/replaces a "## Deflated / recycling CG" section in RESULTS.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import _ledger

MARK = "## Deflated / recycling CG (extension)"


def bench(n, repeats):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.kernels.dispatch import resolve_backend
    from tpucg.solver.cg import _cg_jit
    from tpucg.solver.deflation import _deflated_jit, build_deflation_basis
    from tpucg.solver.operators import as_operator

    backend = resolve_backend("auto")
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([[0.01, 0.02, 0.03],
                          1.0 + rng.uniform(0.0, 1.0, n - 3)])
    A = ((Q * lam) @ Q.T).astype(np.float32)
    A = 0.5 * (A + A.T)
    b = rng.standard_normal(n).astype(np.float32)
    tol = 1e-5 * float(np.linalg.norm(b))
    maxiter = 4 * n

    op = as_operator(jnp.asarray(A), backend=backend)
    bj = jax.device_put(jnp.asarray(b))
    x0 = jnp.zeros(n, jnp.float32)
    basis_eig = build_deflation_basis(A, Q[:, :3].astype(np.float32))

    # Recycled basis: the RecyclingCG state after three solves of a smooth
    # sequence b_t = base + 0.1 t drift (the benchmarked b is the FOURTH).
    base_b = rng.standard_normal(n).astype(np.float32)
    drift = rng.standard_normal(n).astype(np.float32)
    rec = tpucg.RecyclingCG(A, max_vectors=3, tol=tol, maxiter=maxiter)
    seq_iters = []
    for t in range(3):
        r = rec.solve(base_b + 0.1 * t * drift)
        assert bool(r.converged)
        seq_iters.append(int(r.iterations))
    basis_rec = rec._basis
    b4 = base_b + 0.3 * drift
    b4j = jax.device_put(jnp.asarray(b4))
    tol4 = 1e-5 * float(np.linalg.norm(b4))
    jax.tree_util.tree_map(
        jax.block_until_ready,
        (op.A, bj, b4j, basis_eig.W, basis_rec.W),
    )

    def run_plain(operands, bb, x0_):
        (op_,) = operands
        return _cg_jit(op_, bb, x0_, None, tol, maxiter, backend, True).x

    def mk_run_defl(t):
        def run(operands, bb, x0_):
            op_, W, AW, G = operands
            from tpucg.solver.deflation import DeflationBasis

            return _deflated_jit(
                op_, bb, x0_, DeflationBasis(W=W, AW=AW, Ginv=G), None,
                t, maxiter, backend, True,
            ).x
        return run

    res_plain = tpucg.cg_solve(A, b, tol=tol, maxiter=maxiter)
    res_eig = tpucg.cg_solve_deflated(A, b, basis=basis_eig, tol=tol,
                                      maxiter=maxiter)
    res_rec = tpucg.cg_solve_deflated(A, b4, basis=basis_rec, tol=tol4,
                                      maxiter=maxiter)
    assert all(bool(r.converged) for r in (res_plain, res_eig, res_rec))

    import numpy as np

    rows = []
    for label, run, operands, bb, iters in (
        ("plain CG (cold)", run_plain, (op,), bj,
         int(res_plain.iterations)),
        ("deflated: 3 slow eigenvectors", mk_run_defl(tol),
         (op, basis_eig.W, basis_eig.AW, basis_eig.Ginv), bj,
         int(res_eig.iterations)),
        ("deflated: recycled basis (4th solve of a sequence)",
         mk_run_defl(tol4),
         (op, basis_rec.W, basis_rec.AW, basis_rec.Ginv), b4j,
         int(res_rec.iterations)),
    ):
        est = max(iters, 1) * 4.0 * n * n / 819e9
        s = float(np.median([
            time_run_chain(run, operands, bb, x0, iters=repeats,
                           est_solve_s=est)
            for _ in range(3)
        ]))
        rows.append(dict(method=label, n=n, iters=iters, solve_ms=s * 1e3))
        print(f"deflation[{label}]: {s*1e3:.3f} ms ({iters} laps)",
              flush=True)
    return rows, seq_iters


def bench_poisson_sequence(m, nsolves):
    """Recycled sequence on the OPERATOR-SHARDED slab-halo Poisson solver
    (RecyclingCG(mesh=...)): the VERDICT-r2 scenario — recycling pays
    exactly where solves are big and sparse. Smooth RHS sequence
    b_t = base + 0.05 t drift; each converged solution joins the basis."""
    import time as _t

    import jax
    import numpy as np

    import tpucg
    from tpucg.comm.mesh import make_mesh
    from tpucg.solver.operators import PoissonOperator

    n = m ** 3
    rng = np.random.default_rng(5)
    base = rng.standard_normal(n).astype(np.float32)
    drift = rng.standard_normal(n).astype(np.float32)
    tolf = 1e-5 * float(np.linalg.norm(base))
    rec = tpucg.RecyclingCG(PoissonOperator(m=m), max_vectors=4,
                            mesh=make_mesh(), tol=tolf, maxiter=4 * n)
    rows = []
    for t in range(nsolves):
        b = base + 0.05 * t * drift
        t0 = _t.time()
        r = rec.solve(b)
        _ = np.asarray(r.x[:8])  # fetch barrier (tunnel ack != done)
        wall = _t.time() - t0
        # converged at tolf OR an honest stagnation stop at the floor —
        # both are terminal and publishable; a runaway (neither) is not.
        assert bool(r.converged) or int(r.iterations) < 4096, t
        rows.append(dict(t=t, iters=int(r.iterations), wall_s=wall,
                         converged=bool(r.converged)))
        print(f"poisson-seq[{t}]: {int(r.iterations)} laps, "
              f"{wall:.2f} s wall", flush=True)
    return rows


def bench_fem_sequence(n_points, nsolves):
    """RecyclingCG x two-level composed on the irregular FEM workload —
    the production time-stepping story (round-4): the coarse space removes
    the smooth band every right-hand side shares, the recycled basis the
    sequence's specific directions. Smooth RHS drift; laps per solve."""
    import time as _t

    import numpy as np

    import tpucg
    from tpucg.io.generator import fem_p1_system

    A, base, _ = fem_p1_system(n_points, seed=0)
    op = tpucg.best_sparse_operator(A)
    drift = np.random.default_rng(9).standard_normal(
        A.shape[0]).astype(np.float32)
    drift *= 0.1 * float(np.linalg.norm(base)) / float(
        np.linalg.norm(drift))
    # 3e-2 ||b||: above the HONEST (true-residual, round 5) f32 floor of
    # this FEM family — kappa(n=300k)*eps_f32 ~ 2e-2 relative bounds what
    # ANY f32 Krylov method attains here (the r4 1e-3 figure was the
    # drifted recurrence's claim, not the truth; the solver now stops on
    # the true residual and would stagnation-stop below this). Laps per
    # solve, not final accuracy, is this table's metric; the admitted
    # stack also takes best-achievable (stagnation-stopped) solutions.
    tolf = 3e-2 * float(np.linalg.norm(base))
    tl = tpucg.build_two_level(A, agg_size=64, npad=op.padded_n,
                               smooth_degree=2)
    # Watchdog clamp (CLAUDE.md rule 6): the composed solve lands ~100-200
    # laps; a stalled 300k-lap dispatch would crash the TPU worker. Assert
    # convergence instead of letting maxiter ride.
    rec = tpucg.RecyclingCG(op, max_vectors=4, two_level=tl, tol=tolf,
                            maxiter=4096)
    rows = []
    for t in range(nsolves):
        b = base + 0.05 * t * drift
        t0 = _t.time()
        r = rec.solve(b)
        _ = np.asarray(r.x[:8])  # fetch barrier (tunnel ack != done)
        wall = _t.time() - t0
        # converged at tolf OR an honest stagnation stop at the floor —
        # both are terminal and publishable; a runaway (neither) is not.
        assert bool(r.converged) or int(r.iterations) < 4096, t
        rows.append(dict(t=t, iters=int(r.iterations), wall_s=wall,
                         converged=bool(r.converged)))
        print(f"fem-seq[{t}]: {int(r.iterations)} laps, "
              f"{wall:.2f} s wall", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--poisson-m", type=int, default=64,
                    help="slab-Poisson grid edge for the recycled "
                         "operator-sharded sequence (0 disables)")
    ap.add_argument("--poisson-solves", type=int, default=6)
    ap.add_argument("--fem-points", type=int, default=300_000,
                    help="FEM mesh points for the recycled x two-level "
                         "sequence (0 disables)")
    ap.add_argument("--fem-solves", type=int, default=6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows, seq_iters = bench(args.n, args.repeats)
    pois_rows = (
        bench_poisson_sequence(args.poisson_m, args.poisson_solves)
        if args.poisson_m else []
    )
    fem_rows = (
        bench_fem_sequence(args.fem_points, args.fem_solves)
        if args.fem_points else []
    )

    lines = [
        MARK,
        "",
        f"Clustered-spectrum SPD (n={rows[0]['n']}: eigenvalues 0.01/0.02/"
        "0.03 under a [1, 2] bulk), tol 1e-5 ||b|| — the regime where plain "
        "CG crawls on the slow cluster. `cg_solve_deflated` Galerkin-"
        "projects the start and keeps every direction A-orthogonal to the "
        "basis (two tall-skinny HIGHEST GEMVs + an m x m inverse per lap); "
        "`RecyclingCG` feeds previous solutions back in as the basis. The "
        f"recycled row's basis comes from solves 1-3 of a smooth sequence "
        f"(laps {seq_iters}); the timed solve is the fourth right-hand "
        "side. Steady-state chained timings (tunnel RTT cancelled).",
        "",
        "| method | solve (ms) | laps |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['method']} | {r['solve_ms']:.3f} | {r['iters']} |")
    if pois_rows:
        m = args.poisson_m
        lines += [
            "",
            f"Recycled sequence on the OPERATOR-SHARDED slab-halo Poisson "
            f"solver (m={m}, n={m**3}; `RecyclingCG(PoissonOperator(m), "
            "mesh=...)`): each converged solution joins the row-sharded "
            "deflation basis (capped at 4); laps per solve show the "
            "recycling payoff on the decomposition where solves are "
            "expensive. Wall seconds include per-basis-size compiles on "
            "the first solves (each basis width m is a distinct static "
            "shape); the final solve re-uses a compiled width and is the "
            "steady-state representative.",
            "",
            "| solve # | laps | wall (s) |",
            "|---|---|---|",
        ] + [
            f"| {r['t'] + 1} | {r['iters']} | {r['wall_s']:.2f} |"
            for r in pois_rows
        ]
    if fem_rows:
        lines += [
            "",
            f"RecyclingCG x TWO-LEVEL composed on the irregular FEM "
            f"workload (P1 Delaunay n={args.fem_points}-mesh, WELL "
            "operator, `RecyclingCG(op, two_level=build_two_level(..., "
            "smooth_degree=2))`, tol 3e-2 ||b||. Round-5 honesty note: "
            "these solves now stop on the TRUE residual; the f32 "
            "attainable floor of this family is kappa*eps_f32 ~ 2e-2 "
            "RELATIVE at n=300k (round 4's 1e-3-||b|| figure — and its "
            "small-looking absolute true-||r|| columns — were the "
            "drifted recurrence's claim: ||b|| is only ~2e-3 for FEM "
            "loads, so 4e-5 ABSOLUTE was ~2e-2 relative all along). "
            "Laps per solve is the metric; stagnation-stopped solves "
            "(dagger) ended at the measured floor and their solutions "
            "are admitted to the recycled stack as best-achievable.): "
            "the coarse space removes the smooth band every RHS shares, "
            "the recycled basis the sequence's own directions — the FEM "
            "time-stepping serving shape. Wall seconds include "
            "per-basis-width compiles on early solves.",
            "",
            "| solve # | laps | wall (s) |",
            "|---|---|---|",
        ] + [
            f"| {r['t'] + 1} | {r['iters']}"
            + ("" if r.get("converged", True) else "\u2020")
            + f" | {r['wall_s']:.2f} |"
            for r in fem_rows
        ]
    section = "\n".join(lines) + "\n"

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RESULTS.md",
    )
    _ledger.replace_section(out, MARK, section)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
