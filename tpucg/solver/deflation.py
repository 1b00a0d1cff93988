"""Deflated and recycling CG — sequences of related solves.

The reference solves exactly one system per process invocation
(``serialConjugate.c:43-73``); production solvers face SEQUENCES: the same
(or a slowly varying) SPD operator against many right-hand sides (time
stepping, multiple load cases). ``cg_solve_block`` / ``cg_solve_multi``
cover *simultaneous* RHS; this module covers *sequential* RHS by carrying a
deflation subspace between solves.

Deflated CG (Saad, Yeung, Erhel & Guyomarc'h 2000): given a basis
W (n, m), start from the Galerkin-corrected guess

    x0' = x0 + W (W^T A W)^-1 W^T r0        (makes W^T r0' = 0)

and keep every search direction A-orthogonal to range(W):

    p_{k+1} = P z_{k+1} + beta p_k,   P = I - W (W^T A W)^-1 (AW)^T.

With ``W^T r = 0`` maintained, the iteration behaves as if the components
of the spectrum captured by W were removed — the effective condition
number drops accordingly. TPU shape: the projection is two tall-skinny
HIGHEST-precision GEMVs per lap ((m, n) @ (n,) and (n, m) @ (m,)) plus an
m x m solve applied as a precomputed inverse — MXU/VPU work with no
irregular access; the while_loop body stays static.

Implementation note: ``P`` is folded into ``cg_loop``'s ``precond`` slot
(z' = P M^-1 r). Because W^T r = 0 in exact arithmetic, r . (P z) = r . z,
so all CG scalars match the textbook deflated recurrence; the stopping
test stays on the TRUE residual (the reference contract).

``RecyclingCG`` wraps this for the sequence use case: it accumulates
converged solutions as the (orthonormalized) basis for later solves —
near-zero extra cost per solve, large lap savings when the b's share
low-frequency content.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpucg.config import CGConfig
from tpucg.kernels.blas1 import dot_xla, fused_update
from tpucg.kernels.dispatch import resolve_backend
from tpucg.solver.cg import (
    TRUE_CHECK_EVERY,
    CGResult,
    _spd_inv,
    block_jacobi_minv,
    cg_loop,
    make_block_precond,
    make_poly_precond,
)
from tpucg.solver.operators import DenseOperator, as_operator

_HI = jax.lax.Precision.HIGHEST

# Residual-replacement cadence for the deflation x two-level COMPOSED
# recurrence — MEASURED NEGATIVE, default OFF (round 5, VERDICT r4 #7):
# re-anchoring r <- b - Ax (even with the Galerkin-corrected refresh that
# keeps the replaced residual out of span(W)) is honest mid-convergence,
# but once a solve grinds at its f32 floor the replaced scalars feed back
# (beta = rs_new/rsold > 1 against a stale direction) and the iterate
# grows EXPONENTIALLY — measured on FEM P1 n=30k, jacobi AND composed:
# true residual 3e8 ||b|| after 2000 post-floor laps, while the
# unreplaced recurrence stalls harmlessly. The same measurement showed
# the CURRENT composed path (round 4's A-orthonormalized basis) already
# reaches ~3e-5 ||b|| TRUE residual at n=30k without replacement — the
# r4 1e-3 tolerance note was the recurrence-vs-true gap, not a hard
# stall; see RESULTS.md's recycling section for the re-measured floor.
DEFLATED_REPLACE_EVERY = None


class DeflationBasis(NamedTuple):
    """A deflation space, reusable across solves.

    W    (npad, m) columns spanning the deflation subspace —
         A-ORTHONORMAL when built by :func:`build_deflation_basis`
         (W^T A W = I, the G^-1/2 fold done in f64 at setup);
    AW   (npad, m) = A @ W;
    Ginv (m, m)    = (W^T A W)^-1 — the identity for an A-orthonormal W.
    """

    W: jax.Array
    AW: jax.Array
    Ginv: jax.Array

    @property
    def m(self) -> int:
        return int(self.W.shape[1])


def build_deflation_basis(A, V, kernel: str = "auto") -> DeflationBasis:
    """A-orthonormalize the columns of ``V`` (n, m) into a reusable
    :class:`DeflationBasis` for ``A``.

    Rank revealing twice over: V is first orthonormalized by a host-side
    f64 SVD (directions below 1e-6 x the largest singular value PRUNED),
    then G = W^T A W is eigendecomposed in f64 and folded into the basis
    as W <- W G^-1/2 (near-null G eigendirections pruned at 1e-12
    relative), so the stored space satisfies W^T A W = I and the per-lap
    projection needs NO m x m inverse (the old explicit f32 Ginv carried
    kappa(A)-scale entries for solution-type bases). Honest floor note
    (round 4, measured): the fold does NOT remove the composed f32
    floor — the stored A-orthonormal AW inherits the f32 matvec's error
    amplified ~sqrt(kappa) on solution bases (which live on the
    small-eigenvalue end), so a deflation x two-level recurrence on FEM
    P1 flattens at ~7e-5 ||b|| at n=30k, scaling up with condition
    (~2e-4+ at n=300k); size sequence tolerances above that floor
    (RecyclingCG benchmarks use 1e-3 ||b|| at n=300k), or the solve
    grinds at the flatten level to the cap. Setup-only cost (O(n m^2)
    host + m device matvecs); the returned basis may have fewer columns
    than V.
    """
    backend = resolve_backend(kernel)
    op = as_operator(A, backend=backend)
    # Batched basis build: one XLA GEMM beats m Pallas GEMV launches
    # (same exception as cg_solve_multi, solver/cg.py).
    if isinstance(op, DenseOperator) and op.backend == "pallas":
        op = DenseOperator(A=op.A, n=op.n, backend="xla")
    V = np.asarray(V, np.float64)
    if V.ndim == 1:
        V = V[:, None]
    if V.shape[0] != op.n:
        raise ValueError(f"V must have {op.n} rows, got {V.shape}")
    U, s, _ = np.linalg.svd(V, full_matrices=False)
    keep = s > max(1e-6 * (s[0] if s.size else 0.0), 1e-30)
    if not keep.any():
        raise ValueError("V has no usable directions (all ~zero)")
    W = np.ascontiguousarray(U[:, keep], dtype=np.float32)
    npad = op.padded_n
    if npad != op.n:
        W = np.pad(W, ((0, npad - op.n), (0, 0)))
    # One batched device matvec (f32 — the accuracy AW has in the per-lap
    # projection anyway), then the G^-1/2 fold in f64 on the host.
    AW = np.asarray(
        jax.vmap(op.matvec, in_axes=1, out_axes=1)(jnp.asarray(W)),
        np.float64,
    )
    W64 = W.astype(np.float64)
    G = W64.T @ AW
    G = 0.5 * (G + G.T)
    ew, E = np.linalg.eigh(G)
    keep2 = ew > max(1e-12 * float(ew.max()), 1e-300)
    if not keep2.any():
        raise ValueError("V has no A-positive directions (W^T A W ~ 0)")
    S = E[:, keep2] / np.sqrt(ew[keep2])  # W @ S is A-orthonormal
    m2 = int(keep2.sum())
    return DeflationBasis(
        W=jnp.asarray((W64 @ S).astype(np.float32)),
        AW=jnp.asarray((AW @ S).astype(np.float32)),
        Ginv=jnp.eye(m2, dtype=jnp.float32),
    )


def _galerkin_refresh(basis: DeflationBasis):
    """x/r refresh for residual replacement inside the DEFLATED
    recurrence: re-apply the Galerkin correction so the replaced residual
    stays (numerically) orthogonal to span(W)."""

    def refresh(x, r_true):
        y = jnp.matmul(basis.Ginv,
                       jnp.matmul(basis.W.T, r_true, precision=_HI),
                       precision=_HI)
        return (
            x + jnp.matmul(basis.W, y, precision=_HI),
            r_true - jnp.matmul(basis.AW, y, precision=_HI),
        )

    return refresh


def _deflate_precond(basis: DeflationBasis, base):
    """z = P (M^-1 r): the deflation projection folded onto the base
    preconditioner (identity when ``base`` is None)."""

    def apply(r):
        z = r if base is None else base(r)
        c = jnp.matmul(basis.AW.T, z, precision=_HI)
        y = jnp.matmul(basis.Ginv, c, precision=_HI)
        return z - jnp.matmul(basis.W, y, precision=_HI)

    return apply


@functools.partial(
    jax.jit,
    static_argnames=("tol", "maxiter", "blas_backend", "safe_alpha",
                     "poly_degree", "record"),
)
def _deflated_jit(op, b, x0, basis, minv, tol, maxiter, blas_backend,
                  safe_alpha, poly_degree=0, record=False, two_level=None):
    matvec = op.matvec
    if two_level is not None:
        from tpucg.solver.twolevel import make_two_level_precond

        # Deflation x two-level composed: the recycled/eigen basis removes
        # the handful of directions the sequence keeps re-meeting, the
        # coarse space the whole smooth band — z = P (B_2lvl r).
        base = make_two_level_precond(two_level, matvec, dot_xla, b)
    elif poly_degree:
        base = make_poly_precond(matvec, dot_xla, b, poly_degree)
    elif minv is not None:
        base = (
            make_block_precond(minv, b.shape[0])
            if minv.ndim == 3 else (lambda r: minv * r)
        )
    else:
        base = None

    # Galerkin warm start: x0 += W (W^T A W)^-1 W^T r0  =>  W^T r0' = 0.
    r0 = b - matvec(x0)
    y = jnp.matmul(basis.Ginv, jnp.matmul(basis.W.T, r0, precision=_HI),
                   precision=_HI)
    x0 = x0 + jnp.matmul(basis.W, y, precision=_HI)

    update = functools.partial(fused_update, backend=blas_backend)
    s = cg_loop(
        matvec, dot_xla, update, b, x0,
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha,
        precond=_deflate_precond(basis, base),
        hist_len=maxiter if record else None,
        # The composed deflation x two-level recurrence walks away from
        # the true residual near its f32 floor (the projection re-injects
        # the stored AW's amplified matvec error every lap); periodic
        # re-anchoring r <- b - Ax follows the true residual again and
        # lowers the attainable floor (VERDICT r4 #7; measured in
        # RESULTS.md's recycling section). The refresh MUST re-apply the
        # Galerkin correction (x += W Ginv W^T r, r -= AW ...): the
        # projected search directions never move x in span(W), so a
        # plainly-replaced W-component of r would persist and corrupt
        # (r, z) — measured divergent at FEM n=30k.
        replace_every=(DEFLATED_REPLACE_EVERY
                       if two_level is not None else None),
        replace_fn=(_galerkin_refresh(basis)
                    if DEFLATED_REPLACE_EVERY else None),
        # True-residual stopping for the composed strong-preconditioner
        # path (solver.cg.TRUE_CHECK_EVERY): at FEM n=300k warm deflated
        # RECURRENCES sat above a true residual that had already met tol
        # (900-lap cap-outs at a true 9e-8 absolute vs a 4.4e-7 target) —
        # the true test stops them honestly AND makes deeper tolerances
        # reachable than the r4 1e-3 ||b|| sequence constraint.
        check_true_every=(
            TRUE_CHECK_EVERY if two_level is not None else None
        ),
    )
    return CGResult(
        x=s.x, iterations=s.k, residual_norm=jnp.sqrt(s.rslast),
        converged=s.rslast < jnp.asarray(tol, s.rslast.dtype) ** 2,
        residual_history=s.hist,
    )


def cg_solve_deflated(
    A,
    b,
    V=None,
    x0=None,
    basis: Optional[DeflationBasis] = None,
    config: Optional[CGConfig] = None,
    record_residuals: bool = False,
    two_level=None,
    **overrides,
) -> CGResult:
    """Deflated CG: solve A x = b with the subspace ``V`` (n, m) — or a
    prebuilt :func:`build_deflation_basis` result — projected out of the
    iteration. Composes with ``precondition`` in
    {none, jacobi, block_jacobi, poly} — or with a prebuilt
    ``two_level`` (:func:`tpucg.build_two_level`; requires
    ``precondition="none"``), the FEM-sequence pairing: the coarse space
    handles the smooth band every right-hand side shares, the recycled
    basis the specific directions the sequence re-meets. ``method`` must
    be "cg". f32 floor note for the composition: the projection noise the
    strong two-level base re-injects raises the attainable recurrence
    residual ~2-3x over plain PCG's (measured ~2.5e-7 vs a 1.4e-7 target
    on FEM n~6k) — size tol with ~3e-5 * ||b|| headroom or the solve
    grinds at the floor to the cap.

    Typical uses: V = approximate low eigenvectors (drops the effective
    condition number), or V = previous solutions of related systems (see
    :class:`RecyclingCG`).
    """
    from dataclasses import replace as dataclasses_replace

    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    if config.method != "cg":
        raise ValueError(
            f"cg_solve_deflated supports method='cg' (got {config.method!r})"
        )
    if jnp.dtype(config.dtype) != jnp.float32:
        raise ValueError("cg_solve_deflated is float32-only")
    if (V is None) == (basis is None):
        raise ValueError("pass exactly one of V or basis")
    backend = resolve_backend(config.kernel)
    op = as_operator(A, backend=backend)
    n, npad = op.n, op.padded_n
    if basis is None:
        basis = build_deflation_basis(A, V, kernel=config.kernel)
    if basis.W.shape[0] != npad:
        raise ValueError(
            f"basis was built for padded size {basis.W.shape[0]}, "
            f"operator has {npad}"
        )
    b = jnp.asarray(b, jnp.float32)
    if b.shape != (n,):
        raise ValueError(f"b must have shape ({n},), got {b.shape}")
    x0 = jnp.zeros(n, jnp.float32) if x0 is None else jnp.asarray(
        x0, jnp.float32)
    if npad != n:
        b = jnp.pad(b, (0, npad - n))
        x0 = jnp.pad(x0, (0, npad - n))
    maxiter = config.maxiter if config.maxiter is not None else n
    blas_backend = backend if npad % 128 == 0 else "xla"
    if two_level is not None:
        if config.precondition != "none":
            raise ValueError(
                "two_level runs as THE base preconditioner "
                f"(got precondition={config.precondition!r})"
            )
        if two_level.npad != npad:
            raise ValueError(
                f"two_level was built for padded size {two_level.npad}, "
                f"operator has {npad}"
            )
    minv = None
    if config.precondition == "jacobi":
        d = op.diagonal()
        minv = jnp.where(d != 0, 1.0 / d, 1.0).astype(jnp.float32)
    elif config.precondition == "block_jacobi":
        minv = block_jacobi_minv(op, int(config.pc_block_size))
    res = _deflated_jit(
        op, b, x0, basis, minv, float(config.tol), int(maxiter),
        blas_backend, bool(config.safe_alpha),
        config.poly_degree if config.precondition == "poly" else 0,
        bool(record_residuals), two_level,
    )
    if npad != n:
        res = res._replace(x=res.x[:n])
    return res


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "strategy", "backend", "tol", "maxiter",
                     "safe_alpha", "axis", "precondition", "poly_degree",
                     "pc_block_size"),
)
def _sharded_deflated_jit(
    A, b, x0, W, AW, Ginv, *, mesh, strategy, backend, tol, maxiter,
    safe_alpha, axis, precondition="none", poly_degree=0, pc_block_size=64,
):
    """Row-block-sharded deflated CG. W/AW ride the same P(axis) sharding
    as A's rows; the deflation coefficients are ONE extra (m,)-length psum
    per lap (the m x m inverse is replicated); everything else is the
    shard-local tall-skinny GEMV pair of the serial path."""
    from jax.sharding import PartitionSpec as P

    from tpucg.solver.sharded import (
        _jacobi_minv_blk,
        _local_diag_blocks,
        _make_matvec,
        _make_reductions,
    )

    num = mesh.devices.size

    def solve(A_blk, b_blk, x_blk, W_blk, AW_blk, G):
        mv = _make_matvec(A_blk, strategy, num, backend, axis)
        dot, _, update = _make_reductions(axis)
        base = None
        if precondition == "jacobi":
            minv = _jacobi_minv_blk(A_blk, axis)
            base = lambda r: minv * r
        elif precondition == "block_jacobi":
            from tpucg.solver.cg import invert_blocks

            blocks = _local_diag_blocks(A_blk, axis, pc_block_size)
            base = make_block_precond(invert_blocks(blocks), A_blk.shape[0])
        elif precondition == "poly":
            base = make_poly_precond(mv, dot, b_blk, poly_degree)

        def deflate(z_blk):
            c = jax.lax.psum(
                jnp.matmul(AW_blk.T, z_blk, precision=_HI), axis
            )
            y = jnp.matmul(G, c, precision=_HI)
            return z_blk - jnp.matmul(W_blk, y, precision=_HI)

        precond = deflate if base is None else (lambda r: deflate(base(r)))

        # Galerkin warm start (shard-local GEMVs + one m-length psum).
        r0 = b_blk - mv(x_blk)
        c0 = jax.lax.psum(jnp.matmul(W_blk.T, r0, precision=_HI), axis)
        x_blk = x_blk + jnp.matmul(
            W_blk, jnp.matmul(G, c0, precision=_HI), precision=_HI
        )

        s = cg_loop(
            mv, dot, update, b_blk, x_blk,
            tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
        )
        return s.x, s.k, jnp.sqrt(s.rslast), s.done

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis, None),
                  P(axis, None), P(None, None)),
        out_specs=(P(axis), P(), P(), P()),
        # Same scoping rationale as _sharded_cg_jit: the Pallas matvec arms
        # carry no varying-mesh-axes annotation.
        check_vma=(backend != "pallas"),
    )(A, b, x0, W, AW, Ginv)


def _host_basis(Apad: np.ndarray, Vpad: np.ndarray):
    """Host f64 basis build against a padded DENSE matrix: rank-revealing
    SVD orthonormalization, AW, and (W^T A W)^-1 — all in f64, cast to f32
    once (more accurate than the device f32 path and free at setup time)."""
    U, s, _ = np.linalg.svd(np.asarray(Vpad, np.float64),
                            full_matrices=False)
    keep = s > max(1e-6 * (s[0] if s.size else 0.0), 1e-30)
    if not keep.any():
        raise ValueError("V has no usable directions (all ~zero)")
    W = U[:, keep]
    A64 = np.asarray(Apad, np.float64)
    AW = A64 @ W
    G = W.T @ AW
    Ginv = np.linalg.inv(0.5 * (G + G.T))
    return (W.astype(np.float32), AW.astype(np.float32),
            Ginv.astype(np.float32))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "tol", "maxiter", "safe_alpha", "axis", "kind",
                     "m", "m_padded", "precondition", "poly_degree",
                     "offsets", "backend"),
)
def _sharded_operator_deflated_jit(
    op_arrays, b, x0, W, AW, Ginv, minv, *, mesh, tol, maxiter, safe_alpha,
    axis, kind, m=None, m_padded=None, precondition="none", poly_degree=0,
    offsets=None, backend="xla",
):
    """Deflated CG over a sharded sparse/stencil operator: the operator
    matvec closures of ``_sharded_operator_cg_jit`` + the row-sharded
    W/AW projection of ``_sharded_deflated_jit`` (one extra (m,)-length
    psum per lap)."""
    from jax.sharding import PartitionSpec as P

    from tpucg.solver.sharded import (
        _make_reductions,
        _operator_matvec,
        _operator_specs,
        _operator_uses_pallas,
    )

    num = mesh.devices.size

    def solve(op_blk, b_blk, x_blk, W_blk, AW_blk, G, minv_blk):
        mv = _operator_matvec(
            kind, op_blk, axis, num, m, m_padded, offsets, backend
        )
        dot, _, update = _make_reductions(axis)
        base = None
        if precondition == "jacobi":
            base = lambda r: minv_blk * r
        elif precondition == "poly":
            base = make_poly_precond(mv, dot, b_blk, poly_degree)

        def deflate(z_blk):
            c = jax.lax.psum(
                jnp.matmul(AW_blk.T, z_blk, precision=_HI), axis
            )
            y = jnp.matmul(G, c, precision=_HI)
            return z_blk - jnp.matmul(W_blk, y, precision=_HI)

        precond = deflate if base is None else (lambda r: deflate(base(r)))

        r0 = b_blk - mv(x_blk)
        c0 = jax.lax.psum(jnp.matmul(W_blk.T, r0, precision=_HI), axis)
        x_blk = x_blk + jnp.matmul(
            W_blk, jnp.matmul(G, c0, precision=_HI), precision=_HI
        )

        s = cg_loop(
            mv, dot, update, b_blk, x_blk,
            tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
        )
        return s.x, s.k, jnp.sqrt(s.rslast), s.done

    vec = P(axis)
    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(_operator_specs(kind, axis), vec, vec, P(axis, None),
                  P(axis, None), P(None, None), vec),
        out_specs=(vec, P(), P(), P()),
        check_vma=not _operator_uses_pallas(kind, m, m_padded, mesh, backend),
    )(op_arrays, b, x0, W, AW, Ginv, minv)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "backend", "tol", "maxiter", "safe_alpha",
                     "precondition", "poly_degree"),
)
def _sharded2d_deflated_jit(A, b, x0, W, AW, Ginv, minv, *, mesh, backend,
                            tol, maxiter, safe_alpha, precondition="none",
                            poly_degree=0):
    """Deflated CG over the 2-D SUMMA decomposition: W/AW ride the same
    flat P((rows, cols)) sharding as the vectors, the deflation
    coefficients psum over BOTH mesh axes, the m x m inverse is
    replicated."""
    from jax.sharding import PartitionSpec as P

    from tpucg.solver.sharded import _matvec_2d

    r_ax, c_ax = mesh.axis_names
    axes = (r_ax, c_ax)

    def solve(A_blk, b_blk, x_blk, W_blk, AW_blk, G, minv_blk):
        mv = _matvec_2d(A_blk, r_ax, c_ax, backend)
        dot = lambda u, v: jax.lax.psum(dot_xla(u, v), axes)

        def update(x, r, p, ap, alpha):
            x2 = x + alpha * p
            r2 = r - alpha * ap
            return x2, r2, jax.lax.psum(dot_xla(r2, r2), axes)

        base = None
        if precondition == "jacobi":
            base = lambda r: minv_blk * r
        elif precondition == "poly":
            base = make_poly_precond(mv, dot, b_blk, poly_degree)

        def deflate(z_blk):
            c = jax.lax.psum(
                jnp.matmul(AW_blk.T, z_blk, precision=_HI), axes
            )
            y = jnp.matmul(G, c, precision=_HI)
            return z_blk - jnp.matmul(W_blk, y, precision=_HI)

        precond = deflate if base is None else (lambda r: deflate(base(r)))

        r0 = b_blk - mv(x_blk)
        c0 = jax.lax.psum(jnp.matmul(W_blk.T, r0, precision=_HI), axes)
        x_blk = x_blk + jnp.matmul(
            W_blk, jnp.matmul(G, c0, precision=_HI), precision=_HI
        )

        s = cg_loop(
            mv, dot, update, b_blk, x_blk,
            tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
        )
        return s.x, s.k, jnp.sqrt(s.rslast), s.done

    vec = P((r_ax, c_ax),)
    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(r_ax, c_ax), vec, vec, P((r_ax, c_ax), None),
                  P((r_ax, c_ax), None), P(None, None), vec),
        out_specs=(vec, P(), P(), P()),
        check_vma=(backend != "pallas"),
    )(A, b, x0, W, AW, Ginv, minv)


def _sharded2d_deflated(A, b, V, x0, mesh, config) -> CGResult:
    """2-D SUMMA arm of :func:`sharded_cg_solve_deflated` (dense host
    arrays; the basis is built host-side in f64 against the padded
    UN-permuted system — the column permutation is A-storage-only, so W
    and AW live in the ordinary vector order)."""
    from tpucg.solver.sharded import _prepare_sharded2d

    if config.precondition not in ("none", "jacobi", "poly"):
        raise ValueError(
            "2-D deflated CG supports precondition in {'none', 'jacobi', "
            "'poly'} (block Jacobi is 1-D-only: the 2-D decomposition "
            "stores column-permuted blocks)"
        )
    backend = resolve_backend(config.kernel)
    A = np.asarray(A, np.float32)
    n = A.shape[0]
    V = np.asarray(V, np.float32)
    if V.ndim == 1:
        V = V[:, None]
    if V.shape[0] != n:
        raise ValueError(f"V must have {n} rows, got {V.shape}")
    Ad, bd, x0d, minvd, npad = _prepare_sharded2d(
        A, b, x0, mesh, config, backend
    )
    from tpucg.io.partitioner import pad_identity_tail

    Apad = pad_identity_tail(A, npad)
    Vpad = np.pad(V, ((0, npad - n), (0, 0))) if npad != n else V
    W, AW, Ginv = _host_basis(Apad, Vpad)
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    r_ax, c_ax = mesh.axis_names
    shard = NamedSharding(mesh, P((r_ax, c_ax), None))
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rn, done = _sharded2d_deflated_jit(
        Ad, bd, x0d,
        jax.device_put(W, shard),
        jax.device_put(AW, shard),
        jax.device_put(Ginv, NamedSharding(mesh, P(None, None))),
        minvd,
        mesh=mesh, backend=backend,
        tol=float(config.tol), maxiter=int(maxiter),
        safe_alpha=bool(config.safe_alpha),
        precondition=config.precondition,
        poly_degree=(
            int(config.poly_degree) if config.precondition == "poly" else 0
        ),
    )
    res = CGResult(x=x, iterations=k, residual_norm=rn, converged=done)
    if npad != n:
        res = res._replace(x=res.x[:n])
    return res


def _sharded_operator_deflated(op, b, V, x0, mesh, config) -> CGResult:
    """Operator (sparse/stencil) arm of :func:`sharded_cg_solve_deflated`.

    W is orthonormalized host-side (rank-revealing f64 SVD of the padded
    stack); AW is computed with the SHARDED operator matvec itself (one
    device matvec per basis column — sparse operators have no dense host
    form to multiply); G^-1 is inverted host-side in f64 from the f32 AW
    (the same accuracy as the serial path, whose
    ``build_deflation_basis`` also forms AW on device in f32; the serial
    builder additionally folds G^-1/2 into the basis — this sharded
    builder keeps the explicit-Ginv scheme and its documented floor)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from tpucg.solver.sharded import (
        _prepare_sharded_operator,
        _sharded_operator_matvec_jit,
    )

    if config.precondition not in ("none", "jacobi", "poly"):
        raise ValueError(
            "deflated CG on sharded sparse operators supports precondition "
            "in {'none', 'jacobi', 'poly'} (block Jacobi on sharded sparse "
            "operators is unimplemented, matching sharded_operator_cg_solve)"
        )
    axis = mesh.axis_names[0]
    op_arrays, statics, n, npad, minv_host = _prepare_sharded_operator(
        op, mesh, config
    )
    V = np.asarray(V, np.float32)
    if V.ndim == 1:
        V = V[:, None]
    if V.shape[0] != n:
        raise ValueError(f"V must have {n} rows, got {V.shape}")
    Vpad = np.pad(V, ((0, npad - n), (0, 0))) if npad != n else V
    U, s, _ = np.linalg.svd(np.asarray(Vpad, np.float64),
                            full_matrices=False)
    keep = s > max(1e-6 * (s[0] if s.size else 0.0), 1e-30)
    if not keep.any():
        raise ValueError("V has no usable directions (all ~zero)")
    W = np.ascontiguousarray(U[:, keep], dtype=np.float32)

    shard1 = NamedSharding(mesh, P(axis))
    AW = np.stack(
        [
            np.asarray(_sharded_operator_matvec_jit(
                op_arrays,
                jax.device_put(jnp.asarray(W[:, j]), shard1),
                mesh=mesh, axis=axis, **statics,
            ))
            for j in range(W.shape[1])
        ],
        axis=1,
    )
    G = W.astype(np.float64).T @ AW.astype(np.float64)
    Ginv = np.linalg.inv(0.5 * (G + G.T)).astype(np.float32)

    b = np.asarray(b, np.float32)
    if b.shape != (n,):
        raise ValueError(f"b must have shape ({n},), got {b.shape}")
    bp = np.zeros(npad, np.float32)
    bp[:n] = b
    x0p = np.zeros(npad, np.float32)
    if x0 is not None:
        x0p[:n] = np.asarray(x0, np.float32)
    minv = (
        minv_host if minv_host is not None else np.ones(npad, np.float32)
    )
    shard2 = NamedSharding(mesh, P(axis, None))
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rn, done = _sharded_operator_deflated_jit(
        op_arrays,
        jax.device_put(jnp.asarray(bp), shard1),
        jax.device_put(jnp.asarray(x0p), shard1),
        jax.device_put(jnp.asarray(W), shard2),
        jax.device_put(jnp.asarray(AW), shard2),
        jax.device_put(jnp.asarray(Ginv),
                       NamedSharding(mesh, P(None, None))),
        jax.device_put(jnp.asarray(minv), shard1),
        mesh=mesh,
        tol=float(config.tol),
        maxiter=int(maxiter),
        safe_alpha=bool(config.safe_alpha),
        axis=axis,
        precondition=config.precondition,
        poly_degree=(
            int(config.poly_degree) if config.precondition == "poly" else 0
        ),
        **statics,
    )
    res = CGResult(x=x, iterations=k, residual_norm=rn, converged=done)
    if npad != n:
        res = res._replace(x=res.x[:n])
    return res


def sharded_cg_solve_deflated(
    A,
    b,
    V,
    x0=None,
    mesh=None,
    config: Optional[CGConfig] = None,
    **overrides,
) -> CGResult:
    """Deflated CG with A row-block-sharded across the mesh.

    The distributed composition of :func:`cg_solve_deflated`: the basis
    W and AW are row-sharded alongside A, the m x m inverse is replicated,
    and the per-lap deflation costs one extra (m,)-length ``psum`` beyond
    classic sharded CG's scalar reductions. Host arrays only (the basis is
    built host-side in f64 against the identity-padded system).

    Sparse/stencil operators (``PoissonOperator``, ``DIAMatrix`` /
    ``DiaOperator``, ``EllMatrix`` / ``EllOperator``, ``BSRMatrix`` /
    ``BsrOperator``) take the operator decompositions of
    ``sharded_operator_cg_solve`` (slab / band-halo ppermute exchange or
    row-sharded allgather) with the same row-sharded W/AW projection;
    ``precondition`` in {'none', 'jacobi', 'poly'}.
    """
    from dataclasses import replace as dataclasses_replace

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from tpucg.comm.mesh import make_mesh
    from tpucg.io.partitioner import RowPartition, pad_identity_tail
    from tpucg.solver.sharded import distribute_system, row_align

    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    if config.method != "cg":
        raise ValueError(
            "sharded_cg_solve_deflated supports method='cg' "
            f"(got {config.method!r})"
        )
    if mesh is None:
        mesh = make_mesh()
    from tpucg.solver.sharded import _operator_types

    if mesh.devices.ndim == 2:
        if isinstance(A, _operator_types()):
            raise ValueError(
                "sparse operators take the 1-D operator decompositions; "
                "the 2-D SUMMA arm is dense"
            )
        return _sharded2d_deflated(A, b, V, x0, mesh, config)
    if mesh.devices.ndim != 1:
        raise ValueError("deflated solves are supported on 1-D/2-D meshes")
    if isinstance(A, _operator_types()):
        return _sharded_operator_deflated(A, b, V, x0, mesh, config)
    axis = mesh.axis_names[0]
    num = mesh.devices.size
    backend = resolve_backend(config.kernel)
    A = np.asarray(A, np.float32)
    n = A.shape[0]
    from tpucg.solver.sharded import pc_align

    part = RowPartition(n=n, num_shards=num,
                        align=pc_align(row_align(backend), config))
    npad = part.n_padded
    V = np.asarray(V, np.float32)
    if V.ndim == 1:
        V = V[:, None]
    if V.shape[0] != n:
        raise ValueError(f"V must have {n} rows, got {V.shape}")
    Apad = pad_identity_tail(A, npad)
    Vpad = np.pad(V, ((0, npad - n), (0, 0))) if npad != n else V
    W, AW, Ginv = _host_basis(Apad, Vpad)
    Ad, bd, x0d = distribute_system(
        A, np.asarray(b, np.float32),
        None if x0 is None else np.asarray(x0, np.float32),
        mesh, part, axis,
    )
    shard = NamedSharding(mesh, P(axis, None))
    Wd = jax.device_put(W, shard)
    AWd = jax.device_put(AW, shard)
    Gd = jax.device_put(Ginv, NamedSharding(mesh, P(None, None)))
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rn, done = _sharded_deflated_jit(
        Ad, bd, x0d, Wd, AWd, Gd,
        mesh=mesh, strategy=config.strategy, backend=backend,
        tol=float(config.tol), maxiter=int(maxiter),
        safe_alpha=bool(config.safe_alpha), axis=axis,
        precondition=config.precondition,
        poly_degree=int(config.poly_degree),
        pc_block_size=int(config.pc_block_size),
    )
    res = CGResult(x=x, iterations=k, residual_norm=rn, converged=done)
    if npad != n:
        res = res._replace(x=res.x[:n])
    return res


class RecyclingCG:
    """Solve a sequence of systems with one operator, recycling solutions.

    Each converged solution is appended to the deflation space (FIFO-capped
    at ``max_vectors``); later solves Galerkin-project onto it and deflate.
    When the right-hand sides share structure (smooth time series, load
    cases), later solves start near the solution manifold and skip the
    low-frequency part of the spectrum CG converges slowest on.

    >>> rec = RecyclingCG(A, max_vectors=4)
    >>> for b in rhs_sequence:
    ...     res = rec.solve(b)      # lap counts drop after the first solves

    The basis is rebuilt (one host f64 SVD of the (n, m) stack — rank
    revealing, O(n m^2) with m <= ``max_vectors`` — plus m matvecs and an
    m x m inverse) only when a new vector is admitted. Each distinct basis
    size m compiles its own solve (m is a static shape) — bounded by
    ``max_vectors``.

    Pass ``mesh`` to run every solve DISTRIBUTED: dense systems take
    :func:`sharded_cg_solve_deflated`'s row-block path, sparse/stencil
    operators (Poisson slab, DIA band-halo, ELL/BSR) its operator
    decompositions — recycling pays exactly on sequences of large sparse
    solves, where each solve is expensive (the sharded basis rebuild costs
    m device matvecs + one host SVD per admitted vector).
    """

    def __init__(self, A, max_vectors: int = 8, mesh=None,
                 config: Optional[CGConfig] = None, two_level=None,
                 **overrides):
        from dataclasses import replace as dataclasses_replace

        if config is None:
            config = CGConfig(**overrides)
        elif overrides:
            config = dataclasses_replace(config, **overrides)
        if two_level is not None and mesh is not None:
            raise ValueError(
                "RecyclingCG(two_level=...) is serial-only (compose the "
                "sharded arms explicitly via sharded_operator_cg_solve)"
            )
        self.A = A
        self.mesh = mesh
        self.config = config
        self.two_level = two_level
        self.max_vectors = int(max_vectors)
        self._vectors: list = []
        self._basis: Optional[DeflationBasis] = None

    def _solve_sharded(self, b, x0) -> CGResult:
        from tpucg.solver.sharded import (
            _operator_types,
            sharded_cg_solve,
            sharded_operator_cg_solve,
        )

        if self._vectors:
            return sharded_cg_solve_deflated(
                self.A, b, np.stack(self._vectors, axis=1), x0=x0,
                mesh=self.mesh, config=self.config,
            )
        if isinstance(self.A, _operator_types()):
            return sharded_operator_cg_solve(
                self.A, b, x0, mesh=self.mesh, config=self.config
            )
        return sharded_cg_solve(self.A, b, x0, mesh=self.mesh,
                                config=self.config)

    def solve(self, b, x0=None, *, checkpoint_path=None,
              segment_iters: int = 128) -> CGResult:
        """Solve the next system of the sequence. ``checkpoint_path``
        (serial only) routes THIS solve through the segmented
        checkpoint/resume driver — pair it with :meth:`save_state` /
        :meth:`load_state` and an interrupted sequence resumes warm: the
        saved stack restores the deflation space, the .npz checkpoint the
        in-flight solve's mid-trajectory state (same recurrence: the
        checkpointed driver takes the basis + two_level directly)."""
        if checkpoint_path is not None:
            if self.mesh is not None:
                raise ValueError(
                    "RecyclingCG checkpoint_path is serial-only"
                )
            from tpucg.solver.checkpoint import cg_solve_checkpointed

            res = cg_solve_checkpointed(
                self.A, b, x0, config=self.config,
                checkpoint_path=checkpoint_path,
                segment_iters=segment_iters,
                two_level=self.two_level, basis=self._basis,
            )
        elif self.mesh is not None:
            res = self._solve_sharded(b, x0)
        elif self._basis is not None:
            res = cg_solve_deflated(
                self.A, b, basis=self._basis, x0=x0, config=self.config,
                two_level=self.two_level,
            )
        else:
            from tpucg.solver.cg import cg_solve

            res = cg_solve(self.A, b, x0, config=self.config,
                           two_level=self.two_level)
        # Admit the solution to the recycled stack when converged OR when
        # an honest stagnation stop delivered the f32-attainable best
        # (round 5: at FEM n >= 100k the kappa*eps_f32 floor sits at
        # ~1e-2 ||b|| relative, so flagship-scale solves END there — the
        # best-achievable x still spans exactly the low modes recycling
        # wants). The 0.1*||b|| gate keeps garbage (diverged/early-kill)
        # vectors out.
        b_norm = float(np.linalg.norm(np.asarray(b, np.float64)))
        made_progress = (
            float(res.residual_norm) < 0.1 * max(b_norm, 1e-30)
        )
        if bool(res.converged) or made_progress:
            self._vectors.append(np.asarray(res.x, np.float32))
            self._vectors = self._vectors[-self.max_vectors:]
            if self.mesh is None:
                self._basis = build_deflation_basis(
                    self.A, np.stack(self._vectors, axis=1),
                    kernel=self.config.kernel,
                )
        return res

    def _signature(self) -> np.ndarray:
        from tpucg.solver.checkpoint import system_signature

        op = as_operator(self.A)
        return system_signature(op, np.zeros(op.padded_n, np.float32))

    def save_state(self, path: str) -> None:
        """Persist the recycled solution stack as an atomic ``.npz`` —
        the sequence-level analog of ``save_checkpoint`` (which persists
        ONE solve's mid-flight CG state; this persists the BETWEEN-solve
        state a time-stepping run accumulates). Carries the operator's
        probe signature so a restart against a different system refuses
        loudly instead of deflating with a foreign basis.
        """
        import os

        V = (
            np.stack(self._vectors, axis=1)
            if self._vectors else np.zeros((0, 0), np.float32)
        )
        tmp = path + ".tmp"
        np.savez(
            tmp, V=V,
            max_vectors=np.int64(self.max_vectors),
            signature=self._signature(),
        )
        tmp_real = tmp if tmp.endswith(".npz") else tmp + ".npz"
        os.replace(tmp_real, path)

    def load_state(self, path: str) -> int:
        """Restore a :meth:`save_state` stack (returns the number of
        recycled vectors restored). Verifies the operator's probe
        signature first; the basis is rebuilt through the current
        :func:`build_deflation_basis` (so state saved before a basis-
        construction upgrade still loads)."""
        from tpucg.solver.checkpoint import signatures_match

        with np.load(path) as z:
            V = np.asarray(z["V"], np.float32)
            sig = np.asarray(z["signature"])
        if not signatures_match(sig, self._signature()):
            raise ValueError(
                f"recycling state at {path!r} was saved for a DIFFERENT "
                "operator (probe signature mismatch) — refusing to "
                "deflate with a foreign basis"
            )
        # FIFO semantics: the newest vectors are the LAST columns.
        Vk = V[:, -self.max_vectors:] if V.shape[1] else V
        self._vectors = [
            np.ascontiguousarray(Vk[:, j]) for j in range(Vk.shape[1])
        ]
        self._basis = None
        if self._vectors and self.mesh is None:
            self._basis = build_deflation_basis(
                self.A, np.stack(self._vectors, axis=1),
                kernel=self.config.kernel,
            )
        return len(self._vectors)
