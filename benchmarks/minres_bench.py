#!/usr/bin/env python
"""MINRES benchmark (symmetric INDEFINITE systems) -> RESULTS.md section.

Run ON TPU. The reference (and CG) requires SPD (`serialConjugate.c:219-220`
NaNs on an indefinite quadratic form); `tpucg.minres_solve` is the
guaranteed path for merely-symmetric systems. Workloads:

- dense indefinite (half the spectrum negative), plain and — on a badly
  diagonally scaled variant — jacobi (M = 1/|d|) preconditioned;
- the same class in its natural sparse home: an indefinite BANDED system
  (shifted Laplacian, the Helmholtz structure) in DIA form through the
  fused Pallas band kernel.

Timing per CLAUDE.md: K chained data-dependent solves in one dispatch,
differenced; median of >= 3 independent chains with min-max published.
Appends/replaces a "## MINRES (symmetric indefinite, extension)" section.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import _ledger

MARK = "## MINRES (symmetric indefinite, extension)"


def _dense_indefinite(n, seed, scale=False):
    import numpy as np

    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([
        -(1.0 + rng.uniform(0.0, 1.0, n // 2)),
        1.0 + rng.uniform(0.0, 1.0, n - n // 2),
    ])
    A = (Q * lam) @ Q.T
    if scale:
        s = 10.0 ** rng.uniform(-1.5, 1.5, n)
        A = A * s[None, :] * s[:, None]
    A = 0.5 * (A + A.T)
    return A.astype(np.float32)


def _staggered_band_dia(n):
    """Well-posed indefinite band: Laplacian-style off-diagonals (offsets
    +-1, +-512) under a staggered-sign diagonal (+5 / -5 in 512-row
    stripes) — the Dirac-operator-like structure. Gershgorin separates the
    spectrum from zero (|lambda| in [1, 9], both signs present), so the
    indefinite solve is well-conditioned at ANY n — unlike a shifted
    Laplacian, whose Toeplitz spectrum is gapless and goes near-singular
    as n grows."""
    import numpy as np

    from tpucg.sparse.formats import DIAMatrix

    w = 512
    data = np.zeros((5, n), np.float32)
    data[0] = data[4] = -1.0            # +-512
    data[1] = data[3] = -1.0            # +-1
    stripe = (np.arange(n) // w) % 2
    data[2] = np.where(stripe == 0, 5.0, -5.0)
    return DIAMatrix(data=data, offsets=(-w, -1, 0, 1, w), shape=(n, n))


def bench(repeats):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpucg
    from tpucg.bench.timing import time_run_chain
    from tpucg.kernels.blas1 import dot_xla
    from tpucg.kernels.dispatch import resolve_backend
    from tpucg.solver.minres import minres_loop
    from tpucg.solver.operators import DiaOperator, as_operator

    rows = []

    from tpucg.solver.minres import _make_minres_psolve

    def time_arm(label, op, b, tol, maxiter, minv, iters, true_r,
                 bytes_per_mv=None):
        def run(operands, bb, x0_):
            op_, minv_ = operands
            # 1-D minv = point jacobi (1/|d|), 3-D = block |B|^-1 (the
            # batched block GEMV); operand-passed so block batches never
            # inline into the compile payload.
            psolve = _make_minres_psolve(minv_, bb.shape[0])
            s = minres_loop(op_.matvec, dot_xla, bb, x0_,
                            tol=tol, maxiter=maxiter, psolve=psolve)
            return s.x

        x0 = jnp.zeros_like(b)
        p = getattr(op, "padded_n", b.shape[0])
        if bytes_per_mv is None:
            bytes_per_mv = 4.0 * p * p  # dense GEMV streams A once per lap
        # Per-solve estimate sizes the chain (khi ~ 0.05 s of chained work);
        # an under-estimate here once produced a 256-solve chain that the
        # TPU worker's watchdog killed — keep it roofline-honest.
        est = max(iters, 1) * bytes_per_mv / 819e9
        ss = sorted(
            time_run_chain(run, (op, minv), b, x0, iters=repeats,
                           est_solve_s=max(est, 1e-4))
            for _ in range(3)
        )
        s = ss[1]
        rows.append(dict(
            system=label, n=int(b.shape[0]), iters=iters,
            solve_ms=s * 1e3, lo_ms=ss[0] * 1e3, hi_ms=ss[-1] * 1e3,
            ms_per_lap=s * 1e3 / max(iters, 1), true_r=true_r,
        ))
        print(f"minres[{label}]: {s*1e3:.3f} ms "
              f"({ss[0]*1e3:.3f}-{ss[-1]*1e3:.3f}), {iters} laps",
              flush=True)

    # Dense indefinite, plain.
    n = 4096
    A = _dense_indefinite(n, 0)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n).astype(np.float32)
    tol = 1e-4 * float(np.linalg.norm(b))
    res = tpucg.minres_solve(A, b, tol=tol, maxiter=4 * n)
    assert bool(res.converged)
    rr = float(np.linalg.norm(b - A @ np.asarray(res.x)))
    op = as_operator(jnp.asarray(A), backend=resolve_backend("auto"))
    bp = jnp.asarray(np.pad(b, (0, op.padded_n - n)) if op.padded_n != n
                     else b)
    time_arm("dense indefinite (half spectrum < 0)", op, bp, tol,
             2 * int(res.iterations) + 64, None, int(res.iterations), rr)

    # Badly scaled dense indefinite: jacobi (1/|d|) vs plain laps. The
    # timed chain's maxiter is clamped to ~2x the measured lap count — a
    # chained program of 16n-lap while_loops crashed the TPU worker
    # (watchdog) twice before this clamp.
    As = _dense_indefinite(n, 2, scale=True)
    bs_ = rng.standard_normal(n).astype(np.float32)
    tols = 1e-3 * float(np.linalg.norm(bs_))
    cap = 8 * n
    res_pl = tpucg.minres_solve(As, bs_, tol=tols, maxiter=cap)
    res_pc = tpucg.minres_solve(As, bs_, tol=tols, maxiter=cap,
                                precondition="jacobi")
    assert bool(res_pc.converged)
    print(f"scaled: plain laps="
          f"{int(res_pl.iterations)} (conv={bool(res_pl.converged)}), "
          f"jacobi laps={int(res_pc.iterations)}", flush=True)
    rr_pc = float(np.linalg.norm(bs_ - As @ np.asarray(res_pc.x)))
    # backend='xla' is a MEASURED choice for the preconditioned arms: the
    # Pallas GEMV composed with the elementwise 1/|d| psolve runs 0.292
    # ms/lap vs XLA's 0.115 (reproducible across rounds — it published an
    # inverted jacobi-vs-block ranking in round 4 until a fetch-timed
    # single dispatch exposed it). Identity psolve (which XLA's algebraic
    # simplifier elides) is fast, so the cliff is the real vector-multiply
    # fusion feeding the Pallas custom call, not the recurrence variant.
    ops = as_operator(jnp.asarray(As), backend="xla")
    d = np.abs(np.diag(As)).astype(np.float32)
    minv = jnp.asarray(np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 1.0))
    if ops.padded_n != n:
        minv = jnp.pad(minv, (0, ops.padded_n - n), constant_values=1.0)
    bsp = jnp.asarray(np.pad(bs_, (0, ops.padded_n - n))
                      if ops.padded_n != n else bs_)
    plain_laps = (
        int(res_pl.iterations) if bool(res_pl.converged)
        else f">{cap} (did not converge)"
    )
    time_arm(f"dense indef, badly scaled — jacobi (plain: {plain_laps} laps)",
             ops, bsp, tols, 2 * int(res_pc.iterations) + 64, minv,
             int(res_pc.iterations), rr_pc)

    # Block-Jacobi |B|^-1 on the same hard row (VERDICT round-3 item 5):
    # the SPD-ized inverse of each 128x128 diagonal block absorbs the
    # within-block scaling AND coupling point jacobi cannot — the cure for
    # the table's worst lap count, applied as one batched block GEMV/lap.
    from tpucg.solver.minres import abs_inv_blocks

    bs_blk = 128
    res_bj = tpucg.minres_solve(As, bs_, tol=tols, maxiter=cap,
                                precondition="block_jacobi",
                                pc_block_size=bs_blk)
    assert bool(res_bj.converged)
    print(f"scaled: block_jacobi({bs_blk}) laps={int(res_bj.iterations)}",
          flush=True)
    rr_bj = float(np.linalg.norm(bs_ - As @ np.asarray(res_bj.x)[:n]))
    minv_bj = abs_inv_blocks(ops.diagonal_blocks(bs_blk))
    time_arm(
        f"dense indef, badly scaled — block-jacobi |B|^-1 (bs={bs_blk})",
        ops, bsp, tols, 2 * int(res_bj.iterations) + 64, minv_bj,
        int(res_bj.iterations), rr_bj,
    )

    # Indefinite BANDED system in DIA form — the Pallas interleaved band
    # kernel under MINRES (the sparse home of indefinite problems).
    n_b = 262144
    dia = _staggered_band_dia(n_b)
    op_d = DiaOperator.from_dia(dia, backend="pallas")
    b_d = rng.standard_normal(n_b).astype(np.float32)
    tol_d = 1e-4 * float(np.linalg.norm(b_d))
    res_d = tpucg.minres_solve(op_d, b_d, tol=tol_d, maxiter=4 * n_b)
    assert bool(res_d.converged)
    # residual_norm IS the recomputed true ||b - A x|| (_minres_jit).
    rr_d = float(res_d.residual_norm)
    b_dp = jnp.asarray(np.pad(b_d, (0, op_d.padded_n - n_b))
                       if op_d.padded_n != n_b else b_d)
    time_arm("staggered-sign band (Dirac-like; DIA, Pallas kernel)", op_d,
             b_dp, tol_d, 2 * int(res_d.iterations) + 64, None,
             int(res_d.iterations), rr_d,
             bytes_per_mv=4.0 * op_d.padded_n * (5 + 2))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices(), flush=True)
    rows = bench(args.repeats)

    lines = [
        MARK,
        "",
        "Symmetric INDEFINITE systems — outside CG's (and the reference's) "
        "SPD contract (`serialConjugate.c:219-220` would NaN). "
        "`tpucg.minres_solve`: Paige-Saunders Lanczos + Givens QR in one "
        "jitted while_loop, phibar-triggered true-residual confirmation "
        "(CG's stopping contract), jacobi = 1/|diag| and block-Jacobi "
        "|B|^-1 preconditioning, any LinearOperator backend, serial / "
        "1-D sharded / operator-sharded (band-halo DIA, slab Poisson). "
        "Solve times: median of 3 independent chains (min-max); chains "
        "are est-aware-sized (`timing._chain_extra` — big solves chain "
        "once, shrinking watchdog exposure; verified equivalent to the "
        "floor-8 chains it replaced). Block-|B|^-1 on the badly scaled "
        "row is an honest "
        "NEGATIVE result for lap count: 3792 laps vs point-jacobi's "
        "2345 (a CPU block-size sweep bs=32/64/128/256/512 gives "
        "4460/4275/3792/3274/3084 — never beating point 1/|d|): the "
        "diagonal blocks of a randomly-rotated indefinite spectrum "
        "carry no absorbable structure beyond the scaling itself, and "
        "the |.| SPD-ization folds block eigenvalues that point |d| "
        "leaves untouched. Both preconditioned arms run the XLA GEMV "
        "after a round-4 diagnosis: the jacobi row published 689 ms for "
        "two rounds because the Pallas GEMV composed with the "
        "elementwise 1/|d| psolve runs 0.292 ms/lap vs the XLA GEMV's "
        "0.102-0.115 — chain-length-independent (floor-8 and floor-1 "
        "chains both measured ~685 ms on the Pallas path) and pinned to "
        "the real vector-multiply fusion feeding the Pallas custom call "
        "(an identity psolve, which XLA's simplifier elides, runs at "
        "full rate; the block-|B|^-1 einsum psolve is also unaffected). "
        "`minres_solve`'s auto dispatch now prefers the XLA GEMV for "
        "elementwise-preconditioned dense solves; `kernel='pallas'` "
        "overrides.",
        "",
        "| system | n | laps | solve ms (min-max) | ms/lap | true ||r|| |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['system']} | {r['n']} | {r['iters']} "
            f"| {r['solve_ms']:.2f} ({r['lo_ms']:.2f}-{r['hi_ms']:.2f}) "
            f"| {r['ms_per_lap']:.4f} | {r['true_r']:.2e} |"
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
