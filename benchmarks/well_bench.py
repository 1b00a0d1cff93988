"""On-chip WELL (irregular sparse) kernel bench.

Run ON TPU: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/well_bench.py
Measures matvec Gnnz/s for the WELL Pallas kernel vs the legacy ELL/BSR paths
on a genuinely irregular SPD system (random geometric graph Laplacian), plus
a solve-to-convergence row. Chained differencing per CLAUDE.md timing rules.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpucg
from tpucg.bench import timing
from tpucg.io.generator import random_geometric_spd
from tpucg.sparse.well import csr_to_well


def pad_to(v, n):
    out = np.zeros(n, np.float32)
    out[: v.size] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--deg", type=float, default=12.0)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--legacy", action="store_true",
                    help="also time the scalar-gather ELL arm (slow)")
    ap.add_argument("--solve", action="store_true")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    A, b, x0 = random_geometric_spd(args.n, seed=0, dim=args.dim,
                                    avg_degree=args.deg)
    well = csr_to_well(A)
    print(f"n={args.n} nnz={A.nnz} fill={well.fill:.3f} "
          f"NS={well.n_sublanes} NB={well.n_blocks} "
          f"build_s={time.time()-t0:.1f}", flush=True)

    op = tpucg.WellOperator.from_well(well)
    x = jnp.asarray(pad_to(np.random.default_rng(3).standard_normal(args.n)
                           .astype(np.float32), op.padded_n))

    # Correctness on chip first.
    y = np.asarray(op.matvec(x))[: args.n]
    y_ref = A.matvec(np.asarray(x)[: args.n].astype(np.float64))
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
    print(f"on-chip correctness: rel_err={rel:.2e}", flush=True)

    def apply_well(operator, v):
        return operator.matvec(v)

    t = timing.time_matvec_loop(apply_well, op, x, steps=256)
    gnnz = A.nnz / t / 1e9
    slots = well.vals.size
    eff_gb = (slots * 9 + well.wrow.size * (4 + 512)) / t / 1e9
    print(f"WELL pallas: {t*1e6:.1f} us/matvec  {gnnz:.1f} Gnnz/s  "
          f"~{eff_gb:.0f} GB/s streamed", flush=True)

    if args.legacy:
        ell_op = tpucg.EllOperator.from_csr(A)
        t = timing.time_matvec_loop(apply_well, ell_op, jnp.asarray(
            np.asarray(x)[: args.n]), steps=2)
        print(f"ELL xla: {t*1e6:.1f} us/matvec  {A.nnz/t/1e9:.2f} Gnnz/s",
              flush=True)

    if args.solve:
        bp = jnp.asarray(pad_to(b, op.padded_n))
        res = tpucg.cg_solve(op, bp, tol=1e-5 * float(np.linalg.norm(b)))
        jax.block_until_ready(res.x)
        iters = int(res.iterations)
        print(f"solve: iters={iters} ||r||={float(res.residual_norm):.3e} "
              f"converged={bool(res.converged)}", flush=True)
        t = timing.time_solve_chain(
            op, bp, jnp.zeros_like(bp),
            tol=1e-5 * float(np.linalg.norm(b)),
            maxiter=op.padded_n,
            est_solve_s=iters * max(t_mv := A.nnz / (gnnz * 1e9), 1e-6),
        )
        print(f"solve steady-state: {t*1e3:.3f} ms/solve  "
              f"{iters/t:.0f} iters/s", flush=True)


if __name__ == "__main__":
    main()
