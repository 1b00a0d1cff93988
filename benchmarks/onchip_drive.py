"""Combined on-chip drive for the round-2-late features (one TPU process):
chebyshev + block CG + fused-precond regression, each vs serial references.

NOT a benchmark — a hardware VERIFICATION pass (Mosaic layouts, MXU
precision, real collectives) for surfaces the CPU suite only runs in
interpreter mode. Written during the 2026-08-18 tunnel outage; run it the
next time the chip is reachable:

    timeout 1800 python -u benchmarks/onchip_drive.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import time
import numpy as np
import jax
import tpucg
from tpucg.solver.operators import PoissonOperator

t0 = time.time()
def lap(msg):
    print(f"[{time.time()-t0:.0f}s] {msg}", flush=True)

# --- goldens through the default path (sanity) ------------------------------
A, b, x0 = tpucg.io.textio.load_system(
    '/root/reference/matrixA.txt', '/root/reference/vectorb.txt',
    '/root/reference/initialguess.txt')
r = tpucg.cg_solve(A, b, x0)
assert int(r.iterations) == 2 and bool(r.converged)
lap(f"golden cg ok {np.asarray(r.x)}")

# --- chebyshev: golden, clustered, stencil+poly, sharded --------------------
r = tpucg.cg_solve(A, b, x0, method="chebyshev", maxiter=256)
resid = np.linalg.norm(np.asarray(b) - np.asarray(A) @ np.asarray(r.x))
lap(f"cheb golden: {int(r.iterations)} conv={bool(r.converged)} "
    f"true||r||={resid:.2e}")
assert bool(r.converged) and resid < 2e-6

A4, b4, x04 = tpucg.generate_spd_system(4096, seed=0)
ref = tpucg.cg_solve(A4, b4, x04)
ch = tpucg.cg_solve(A4, b4, x04, method="chebyshev", maxiter=4096)
lap(f"cheb n=4096: {int(ch.iterations)} (cg {int(ref.iterations)}) "
    f"conv={bool(ch.converged)}")
assert bool(ch.converged)
np.testing.assert_allclose(np.asarray(ch.x), np.asarray(ref.x),
                           rtol=1e-3, atol=1e-5)

m = 32; n3 = m ** 3
op = PoissonOperator(m=m, kernel="pallas")
bp = np.ones(n3, np.float32)
tol = 1e-5 * float(np.linalg.norm(bp))
cgs = tpucg.cg_solve(op, bp, tol=tol, maxiter=8 * n3)
chs = tpucg.cg_solve(op, bp, tol=tol, maxiter=8 * n3, method="chebyshev")
chp = tpucg.cg_solve(op, bp, tol=tol, maxiter=8 * n3, method="chebyshev",
                     precondition="poly", poly_degree=3)
lap(f"cheb poisson m=32: cg {int(cgs.iterations)} cheb {int(chs.iterations)} "
    f"cheb+poly {int(chp.iterations)} conv={bool(chs.converged)},"
    f"{bool(chp.converged)}")
assert bool(chs.converged) and bool(chp.converged)
np.testing.assert_allclose(np.asarray(chs.x), np.asarray(cgs.x),
                           rtol=1e-2, atol=1e-3)

for s in ("allgather", "overlap"):
    rs = tpucg.sharded_cg_solve(A4, b4, x04, strategy=s,
                                method="chebyshev", maxiter=4096)
    lap(f"cheb sharded {s}: {int(rs.iterations)} conv={bool(rs.converged)}")
    assert bool(rs.converged)

# --- block CG: parity, laplacian win, jacobi, zero col, sharded -------------
nb, kb = 512, 8
Ab = (2 * np.eye(nb) - np.eye(nb, k=1) - np.eye(nb, k=-1)).astype(np.float32)
rng = np.random.default_rng(2)
Bb = rng.standard_normal((nb, kb)).astype(np.float32)
tolb = 3e-4 * float(np.linalg.norm(Bb[:, 0]))
res = tpucg.cg_solve_block(Ab, Bb, tol=tolb, maxiter=4 * nb)
multi = tpucg.cg_solve_multi(Ab, Bb, tol=tolb, maxiter=4 * nb)
lap(f"block laplacian: {int(res.iterations)} laps vs multi "
    f"{int(np.asarray(multi.iterations).max())}; conv="
    f"{np.asarray(res.converged).all()}")
assert np.asarray(res.converged).all()
assert int(res.iterations) < int(np.asarray(multi.iterations).max())
for j in range(kb):
    resid = np.linalg.norm(Bb[:, j] - Ab @ np.asarray(res.x)[:, j])
    assert resid < 5 * tolb, (j, resid)

# dense-generator parity (exercises _chol/_tri HIGHEST kernels on MXU-land)
Ag, bg, _ = tpucg.generate_spd_system(1024, seed=5)
Bg = rng.standard_normal((1024, 4)).astype(np.float32)
rb = tpucg.cg_solve_block(Ag, Bg)
assert np.asarray(rb.converged).all()
for j in range(4):
    ref1 = tpucg.cg_solve(Ag, Bg[:, j])
    np.testing.assert_allclose(np.asarray(rb.x)[:, j], np.asarray(ref1.x),
                               rtol=1e-3, atol=1e-5)
lap(f"block generator n=1024 k=4: {int(rb.iterations)} laps, parity ok")

rz = tpucg.cg_solve_block(Ag, np.zeros((1024, 2), np.float32))
assert np.asarray(rz.converged).all()
assert np.isfinite(np.asarray(rz.x)).all()
lap("block zero-col ok")

d = np.exp(rng.uniform(0.0, np.log(1e3), 1024)).astype(np.float32)
Asc = (np.asarray(Ag) * d[:, None] * d[None, :]).astype(np.float32)
scale = 1.0 / np.sqrt(np.diag(Asc))
tolj = 1e-5 * float(np.linalg.norm(scale * Bg[:, 0]))
rj = tpucg.cg_solve_block(Asc, Bg, precondition="jacobi", tol=tolj,
                          maxiter=4096)
assert np.asarray(rj.converged).all()
lap(f"block jacobi: {int(rj.iterations)} laps ok")

sh = tpucg.sharded_cg_solve_block(np.asarray(Ag), Bg)
assert np.asarray(sh.converged).all()
np.testing.assert_allclose(np.asarray(sh.x), np.asarray(rb.x),
                           rtol=1e-3, atol=1e-5)
lap("block sharded (mesh of 1) parity ok")

# --- preconditioned block CG (round-2-late flexible paths) ------------------
# poly block (flexible M^-1-inner-product BCGrQ) on the Pallas stencil op
Bp4 = rng.standard_normal((n3, 4)).astype(np.float32)
tolp = 1e-5 * float(np.linalg.norm(Bp4[:, 0]))
bp_poly = tpucg.cg_solve_block(op, Bp4, tol=tolp, maxiter=4 * n3,
                               precondition="poly", poly_degree=3)
bp_plain = tpucg.cg_solve_block(op, Bp4, tol=tolp, maxiter=4 * n3)
assert np.asarray(bp_poly.converged).all()
assert int(bp_poly.iterations) < int(bp_plain.iterations)
for j in range(4):
    ref1 = tpucg.cg_solve(op, Bp4[:, j], tol=tolp, maxiter=4 * n3,
                          precondition="poly", poly_degree=3)
    # Two independent f32 Krylov paths solved to tolp~1e-3: x may differ
    # by O(tolp/lambda_min), so compare at tol scale (real-MXU reduction
    # order drifts past interpreter-mode agreement — seen 1.4e-4 on chip).
    np.testing.assert_allclose(np.asarray(bp_poly.x)[:, j],
                               np.asarray(ref1.x), rtol=1e-2, atol=1e-3)
lap(f"block poly (stencil): {int(bp_poly.iterations)} laps vs plain "
    f"{int(bp_plain.iterations)}, parity ok")

# jacobi block on a matrix-free op = matrix-free symmetric equilibration
bj = tpucg.cg_solve_block(op, Bp4, tol=tolp, maxiter=4 * n3,
                          precondition="jacobi")
assert np.asarray(bj.converged).all()
lap(f"block jacobi matrix-free (const diag): {int(bj.iterations)} laps ok")

# sharded preconditioned block arms (mesh of 1 on chip)
shj = tpucg.sharded_cg_solve_block(Asc, Bg, precondition="jacobi",
                                   tol=tolj, maxiter=4096)
assert np.asarray(shj.converged).all()
np.testing.assert_allclose(np.asarray(shj.x), np.asarray(rj.x),
                           rtol=1e-3, atol=1e-4)
shp = tpucg.sharded_cg_solve_block(np.asarray(Ag), Bg,
                                   precondition="poly", poly_degree=2)
assert np.asarray(shp.converged).all()
lap("sharded preconditioned block (jacobi/poly) ok")

# --- block-Jacobi preconditioner (batched block-GEMV apply on MXU) -----------
nL = 1024
Lb = (2 * np.eye(nL) - np.eye(nL, k=1) - np.eye(nL, k=-1)).astype(np.float32)
bL = rng.standard_normal(nL).astype(np.float32)
tolL = 4e-3 * float(np.linalg.norm(bL))
r_pl = tpucg.cg_solve(Lb, bL, tol=tolL, maxiter=8 * nL)
r_bj = tpucg.cg_solve(Lb, bL, tol=tolL, maxiter=8 * nL,
                      precondition="block_jacobi", pc_block_size=64)
assert bool(r_bj.converged)
assert int(r_bj.iterations) * 4 < int(r_pl.iterations)
resid = np.linalg.norm(bL - Lb @ np.asarray(r_bj.x))
assert resid < 2 * tolL, resid
lap(f"block-jacobi dense: {int(r_bj.iterations)} laps vs plain "
    f"{int(r_pl.iterations)}")
r_bj3 = tpucg.cg_solve(op, bp, tol=tol, maxiter=8 * n3,
                       precondition="block_jacobi")  # Pallas stencil op
assert bool(r_bj3.converged)
r_shj = tpucg.sharded_cg_solve(Lb, bL, tol=tolL, maxiter=8 * nL,
                               precondition="block_jacobi",
                               pc_block_size=64)
assert bool(r_shj.converged)
lap(f"block-jacobi stencil {int(r_bj3.iterations)} / sharded "
    f"{int(r_shj.iterations)} laps ok")

# block CG x block-jacobi (blockwise equilibration: batched eigh + GEMMs)
rng2 = np.random.default_rng(9)
band = 2.05 * np.eye(512) - np.eye(512, k=1) - np.eye(512, k=-1)
d2 = np.exp(rng2.uniform(0.0, np.log(30.0), 512))
Abb = (band * d2[:, None] * d2[None, :]).astype(np.float32)
Bbb = rng2.standard_normal((512, 4)).astype(np.float32)
sc2 = 1.0 / np.sqrt(np.diag(Abb))
tol2 = 1e-4 * float(np.linalg.norm(sc2 * Bbb[:, 0]))
rbj_blk = tpucg.cg_solve_block(Abb, Bbb, precondition="block_jacobi",
                               pc_block_size=64, tol=tol2, maxiter=4096)
rj_blk = tpucg.cg_solve_block(Abb, Bbb, precondition="jacobi",
                              tol=tol2, maxiter=4096)
assert np.asarray(rbj_blk.converged).all()
assert int(rbj_blk.iterations) < int(rj_blk.iterations)
shbj = tpucg.sharded_cg_solve_block(Abb, Bbb, precondition="block_jacobi",
                                    pc_block_size=64, tol=tol2,
                                    maxiter=4096)
assert np.asarray(shbj.converged).all()
lap(f"block-cg x block-jacobi: {int(rbj_blk.iterations)} laps vs jacobi "
    f"{int(rj_blk.iterations)}; sharded {int(shbj.iterations)} ok")

print("ALL ON-CHIP DRIVES PASSED", flush=True)
