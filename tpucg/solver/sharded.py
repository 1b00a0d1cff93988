"""Distributed CG over a device mesh.

This is the TPU-native re-design of the reference's two parallel programs
(SURVEY.md §2.3-2.4). The decomposition is the same 1-D row-block striping
("row-wise block-striped decomposition", report §5.2; ``MPI_Scatter`` of A at
``parallel_cg.c:112-115``) — A sharded ``P('rows', None)``, b/x/r/p sharded
``P('rows')`` — but the communication is XLA collectives over ICI:

- scalar reductions (rsold / p.Ap / beta): ``lax.psum`` inside shard_map,
  replacing the three ``MPI_Allreduce`` calls per iteration
  (``parallel_cg.c:287,294,313``);
- strategy "allgather": rebuild the full direction vector each iteration via
  ``lax.all_gather`` then one local (rows/P, n) GEMV — semantically the
  collective arm (``MPI_Allgather``, ``parallel_cg.c:290-292``);
- strategy "overlap": p stays block-sharded; the local GEMV is split into P
  column-block partial products while a ``lax.ppermute`` ring rotates p blocks
  between neighbors, overlapping each transfer with the concurrent partial
  matvec. This is the hand-rolled send/recv arm of ``point-to-point_cg.c``
  rebuilt the TPU way (ring collective with compute/comm overlap instead of
  sequential rank-0 gather+bcast).

Unlike the reference, x is block-sharded too — ``parallel_cg.c:299-303``
redundantly updates the full replicated x on every rank (SURVEY.md §3.2 quirk);
here every vector op is O(n/P) per device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpucg.comm.mesh import ROWS_AXIS, make_mesh
from tpucg.config import CGConfig
from tpucg.io.partitioner import RowPartition, pad_system
from tpucg.kernels.blas1 import dot_xla
from tpucg.kernels.dispatch import resolve_backend
from tpucg.kernels.matvec import matvec
from tpucg.kernels.spmv import ell_spmv
from tpucg.solver.cg import (
    CGResult,
    cg_loop,
    dataclasses_replace,
    make_poly_precond,
    pipelined_cg_loop,
)


def row_align(backend: str) -> int:
    """Per-shard row alignment: the Pallas GEMV needs 128-row/col tiles per
    shard (x2 safety for tile picking); XLA just needs the f32 sublane."""
    return 256 if backend == "pallas" else 8


def _make_reductions(axes):
    """The psum-backed scalar closures every decomposition shares: ``dot``
    (vecVec + MPI_Allreduce, ``parallel_cg.c:286-287``), ``dot2`` (the
    pipelined method's single fused two-scalar reduction), and the classic
    ``update``. ``axes`` is the mesh axis (or tuple of axes) to reduce over.
    """

    def dot(u, v):
        return jax.lax.psum(dot_xla(u, v), axes)

    def dots(pairs):
        # ALL of a lap's scalars in ONE fused psum — the pipelined method's
        # point: a single (k,)-vector allreduce, overlappable with the matvec.
        part = jnp.stack([dot_xla(u, v) for u, v in pairs])
        tot = jax.lax.psum(part, axes)
        return tuple(tot[i] for i in range(len(pairs)))

    def update(x, r, p, ap, alpha):
        xn = x + alpha * p
        rn = r - alpha * ap
        return xn, rn, dot(rn, rn)

    return dot, dots, update


def _run_pipelined(mv, dot, dots, b_blk, x_blk, tol, maxiter, safe_alpha,
                   precond=None):
    """Pipelined loop + the honest convergence epilogue (the loop tests one
    lap late; on a cap exit recompute the true r.r for reporting)."""
    s = pipelined_cg_loop(
        mv, dots, b_blk, x_blk,
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
    )
    rr = jnp.where(s.done, s.rslast, dot(s.r, s.r))
    done = jnp.logical_or(s.done, rr < jnp.asarray(tol, rr.dtype) ** 2)
    return s.x, s.k, jnp.sqrt(rr), done


def _ring_perm(num: int) -> list:
    """ppermute pairs: device j receives the block held by j+1 (mod P), i.e.
    blocks flow one step down the ring each lap."""
    return [((j + 1) % num, j) for j in range(num)]


def _make_matvec(A_blk, strategy: str, num_shards: int, backend: str, axis: str):
    block_rows = A_blk.shape[0]

    if strategy == "allgather":

        def mv(p_blk):
            p_full = jax.lax.all_gather(p_blk, axis, tiled=True)
            return matvec(A_blk, p_full, backend=backend)

        return mv

    def mv(p_blk):
        # Ring matvec: at step s this device multiplies its A column-block
        # (my + s) mod P with the p block currently in hand, while the next p
        # block is already in flight on the ring. Statically unrolled
        # (num_shards is a mesh constant) so XLA's scheduler can overlap each
        # ppermute with the concurrent partial GEMV.
        my = jax.lax.axis_index(axis)
        y = jnp.zeros((block_rows,), jnp.float32)
        p_cur = p_blk
        for s in range(num_shards):
            idx = jax.lax.rem(my + s, num_shards)
            col0 = (idx * block_rows).astype(jnp.int32)
            A_cols = jax.lax.dynamic_slice(
                A_blk, (jnp.int32(0), col0), (block_rows, block_rows)
            )
            p_next = (
                jax.lax.ppermute(p_cur, axis, _ring_perm(num_shards))
                if s < num_shards - 1
                else p_cur
            )
            y = y + matvec(A_cols, p_cur, backend=backend)
            p_cur = p_next
        return y

    return mv


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "strategy", "backend", "tol", "maxiter", "safe_alpha", "axis",
        "precondition", "method", "poly_degree",
    ),
)
def _sharded_cg_jit(
    A, b, x0, *, mesh, strategy, backend, tol, maxiter, safe_alpha, axis,
    precondition="none", method="cg", poly_degree=0,
):
    num = mesh.devices.size

    def solve(A_blk, b_blk, x_blk):
        mv = _make_matvec(A_blk, strategy, num, backend, axis)

        precond = None
        if precondition == "jacobi":
            # Each shard's diagonal entries live in its own column block:
            # rows [0, n/P) of A_blk map to global rows my*n/P + i, so the
            # diagonal is A_blk[i, my*n/P + i].
            block_rows = A_blk.shape[0]
            my = jax.lax.axis_index(axis)
            col0 = (my * block_rows).astype(jnp.int32)
            d = jnp.diagonal(jax.lax.dynamic_slice(
                A_blk, (jnp.int32(0), col0), (block_rows, block_rows)
            ))
            minv = jnp.where(d != 0, 1.0 / d, 1.0).astype(jnp.float32)
            precond = lambda r: minv * r

        dot, dots, update = _make_reductions(axis)
        if precondition == "poly":
            precond = make_poly_precond(mv, dot, b_blk, poly_degree)
        if method == "pipelined":
            # ONE fused psum per lap, overlappable with q = A w.
            return _run_pipelined(
                mv, dot, dots, b_blk, x_blk, tol, maxiter, safe_alpha,
                precond=precond,
            )

        s = cg_loop(
            mv, dot, update, b_blk, x_blk,
            tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
        )
        return s.x, s.k, jnp.sqrt(s.rslast), s.done

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P()),
        # VMA checking is scoped to the XLA arms: pallas_call outputs carry
        # no varying-mesh-axes annotation (and the interpret-mode lowering's
        # internal while_loop rejects vma-annotated out_shapes outright), so
        # the Pallas arms would trip the verifier; there, replication of the
        # scalar outputs is guaranteed by psum instead.
        check_vma=(backend != "pallas"),
    )(A, b, x0)


def _colperm_2d(npad: int, R: int, C: int) -> np.ndarray:
    """Column permutation aligning A's storage with the 2-D gather order.

    Vectors are sharded P(('rows','cols')): device (i, j) holds the
    contiguous chunk k = i*C + j. ``all_gather`` over 'rows' on device (i, j)
    concatenates chunks (0..R-1, j) in i-order, so A's local column block must
    contain exactly those chunks' columns in that order: global column
    position j*(npad/C) + i*(npad/(R*C)) + t maps to column (i*C+j)*chunk + t.
    A pure storage-layout permutation — vectors, b, and the solution all stay
    in natural order.
    """
    cs = npad // (R * C)
    perm = np.empty(npad, dtype=np.int64)
    pos = 0
    for j in range(C):
        for i in range(R):
            k = i * C + j
            perm[pos:pos + cs] = np.arange(k * cs, (k + 1) * cs)
            pos += cs
    return perm


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "backend", "tol", "maxiter", "safe_alpha", "method",
        "precondition", "poly_degree",
    ),
)
def _sharded2d_cg_jit(
    A, b, x0, minv, *, mesh, backend, tol, maxiter, safe_alpha, method="cg",
    precondition="none", poly_degree=0,
):
    """2-D block decomposition (SUMMA-style GEMV) — beyond the reference
    (which only row-stripes, SURVEY.md §2.4): A sharded P('rows','cols'),
    vectors fully sharded over both axes. Per lap the direction vector is
    all-gathered only within mesh columns (n/C data over R devices) and the
    partial GEMV results reduce-scattered within mesh rows (n/R over C) —
    O(n/C + n/R) comm instead of the 1-D allgather's O(n)."""
    r_ax, c_ax = mesh.axis_names

    def solve(A_blk, b_blk, x_blk, minv_blk):
        def mv(p_blk):
            p_cols = jax.lax.all_gather(p_blk, r_ax, tiled=True)  # (n/C,)
            partial = matvec(A_blk, p_cols, backend=backend)      # (n/R,)
            return jax.lax.psum_scatter(
                partial, c_ax, scatter_dimension=0, tiled=True
            )  # (n/(R*C),)

        dot, dots, update = _make_reductions((r_ax, c_ax))

        precond = None
        if precondition == "jacobi":
            # The diagonal is computed on the host (distribute step) and
            # sharded exactly like the vectors, so the preconditioner is a
            # local elementwise multiply.
            precond = lambda r: minv_blk * r
        elif precondition == "poly":
            precond = make_poly_precond(mv, dot, b_blk, poly_degree)

        if method == "pipelined":
            return _run_pipelined(
                mv, dot, dots, b_blk, x_blk, tol, maxiter, safe_alpha,
                precond=precond,
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
        in_specs=(P(r_ax, c_ax), vec, vec, vec),
        out_specs=(vec, P(), P(), P()),
        # See _sharded_cg_jit: VMA checking on except under Pallas kernels.
        check_vma=(backend != "pallas"),
    )(A, b, x0, minv)


def distribute_system_2d(
    A: np.ndarray,
    b: np.ndarray,
    x0: Optional[np.ndarray],
    mesh: Mesh,
    align: int = 1,
):
    """Pad, column-permute, and place (A, b, x0) block-sharded on a 2-D mesh
    (see ``_colperm_2d``). Returns (A2, b, x0, n_padded)."""
    R, C = mesh.devices.shape
    n = A.shape[0]
    base = int(np.lcm.reduce([R * C, R * align, C * align]))
    npad = ((n + base - 1) // base) * base
    part = RowPartition(n=n, num_shards=1, align=npad)  # pad to npad exactly
    Ap, bp, x0p = pad_system(A, b, x0, part)
    A2 = Ap[:, _colperm_2d(npad, R, C)]
    r_ax, c_ax = mesh.axis_names
    return (
        jax.device_put(A2, NamedSharding(mesh, P(r_ax, c_ax))),
        jax.device_put(bp, NamedSharding(mesh, P((r_ax, c_ax),))),
        jax.device_put(x0p, NamedSharding(mesh, P((r_ax, c_ax),))),
        npad,
    )


def _poisson_halo_matvec(m: int, mp: int, axis: str, num: int):
    """Slab-decomposed 3-D 7-point Laplacian with ppermute halo exchange.

    Device d owns x-planes [d*mp, (d+1)*mp) of the m^3 grid. Each lap it
    needs one boundary plane from each neighbor; the two ``ppermute`` halo
    transfers are dataflow-independent of the in-slab y/z stencil work, so
    XLA overlaps the ICI hop with local compute — the BASELINE.json north
    star ("halo segments exchanged via collective-permute overlapped with
    local matVec"), replacing the reference's replicate-everything allgather
    (``parallel_cg.c:290-291``). Unpaired edge devices receive zeros from
    ppermute — exactly the Dirichlet boundary condition.
    """
    from tpucg.kernels.stencil import poisson3d_slab_pallas, slab_supported

    down = [(j, j + 1) for j in range(num - 1)]  # d sends its last plane to d+1
    up = [(j + 1, j) for j in range(num - 1)]    # d sends its first plane to d-1
    use_pallas = slab_supported(m, mp)

    def mv(u_flat):
        u = u_flat.reshape(mp, m, m)
        halo_lo = jax.lax.ppermute(u[-1:], axis, down)  # plane (d*mp - 1)
        halo_hi = jax.lax.ppermute(u[:1], axis, up)     # plane ((d+1)*mp)
        if use_pallas:
            # Single fused in-VMEM pass; the ppermute halos land as (1, m*m)
            # rows carrying zeros at the global edges (Dirichlet for free).
            return poisson3d_slab_pallas(
                u_flat.reshape(mp, m * m), halo_lo, halo_hi, m
            ).reshape(-1)
        # XLA fallback: in-slab y/z stencil (independent of the halos ->
        # overlaps them), then the x-direction via the extended slab.
        y = 6.0 * u
        zeros = jnp.zeros_like(u[:, :1])
        y = y - jnp.concatenate([u[:, 1:], zeros], axis=1)
        y = y - jnp.concatenate([zeros, u[:, :-1]], axis=1)
        zeros = jnp.zeros_like(u[:, :, :1])
        y = y - jnp.concatenate([u[:, :, 1:], zeros], axis=2)
        y = y - jnp.concatenate([zeros, u[:, :, :-1]], axis=2)
        u_ext = jnp.concatenate([halo_lo, u, halo_hi], axis=0)  # (mp+2, m, m)
        y = y - u_ext[2:] - u_ext[:-2]
        return y.reshape(-1)

    return mv


def _ell_allgather_matvec(values_blk, indices_blk, axis: str):
    """Row-sharded ELL SpMV: gather the full direction vector, multiply the
    local rows (global column indices stay valid). The sparse analog of the
    reference's collective arm."""

    def mv(x_blk):
        x_full = jax.lax.all_gather(x_blk, axis, tiled=True)
        return ell_spmv(values_blk, indices_blk, x_full)

    return mv


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "tol", "maxiter", "safe_alpha", "axis", "method", "kind", "m",
        "precondition", "poly_degree",
    ),
)
def _sharded_operator_cg_jit(
    op_arrays, b, x0, minv, *, mesh, tol, maxiter, safe_alpha, axis,
    method="cg", kind="ell", m=None, precondition="none", poly_degree=0,
):
    num = mesh.devices.size

    def solve(op_blk, b_blk, x_blk, minv_blk):
        if kind == "poisson":
            mv = _poisson_halo_matvec(m, m // num, axis, num)
        else:
            values_blk, indices_blk = op_blk
            mv = _ell_allgather_matvec(values_blk, indices_blk, axis)

        dot, dots, update = _make_reductions(axis)
        precond = None
        if precondition == "jacobi":
            precond = lambda r: minv_blk * r
        elif precondition == "poly":
            precond = make_poly_precond(mv, dot, b_blk, poly_degree)
        if method == "pipelined":
            return _run_pipelined(
                mv, dot, dots, b_blk, x_blk, tol, maxiter, safe_alpha,
                precond=precond,
            )

        s = cg_loop(
            mv, dot, update, b_blk, x_blk,
            tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
        )
        return s.x, s.k, jnp.sqrt(s.rslast), s.done

    vec = P(axis)
    op_specs = (
        P(axis) if kind == "poisson" else (P(axis, None), P(axis, None))
    )
    # The Poisson slab arm runs the fused Pallas slab kernel when supported
    # (see _poisson_halo_matvec) — only then must the VMA verifier stand down
    # (see _sharded_cg_jit).
    from tpucg.kernels.stencil import slab_supported

    uses_pallas = kind == "poisson" and slab_supported(m, m // num)
    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(op_specs, vec, vec, vec),
        out_specs=(vec, P(), P(), P()),
        check_vma=not uses_pallas,
    )(op_arrays, b, x0, minv)


def sharded_operator_cg_solve(
    op,
    b,
    x0=None,
    mesh: Optional[Mesh] = None,
    config: Optional[CGConfig] = None,
    **overrides,
) -> CGResult:
    """Distributed CG on a sparse/stencil operator over a 1-D mesh.

    - ``PoissonOperator``: slab decomposition with overlapped ppermute halo
      exchange (requires m %% P == 0);
    - ``EllOperator``: row-block sharded values/indices + all_gather of the
      direction vector (requires n %% P == 0; build from a padded CSR if not).
    """
    from tpucg.solver.operators import EllOperator, PoissonOperator

    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    num = mesh.devices.size
    n = op.n
    b = jnp.asarray(b, jnp.float32)
    x0 = jnp.zeros(n, jnp.float32) if x0 is None else jnp.asarray(x0, jnp.float32)
    shard1 = NamedSharding(mesh, P(axis))

    if isinstance(op, PoissonOperator):
        if op.m % num:
            raise ValueError(f"grid edge m={op.m} not divisible by P={num}")
        kind, m_static = "poisson", op.m
        op_arrays = jnp.zeros((num,), jnp.float32)  # placeholder, unused
        op_arrays = jax.device_put(op_arrays, shard1)
    elif isinstance(op, EllOperator):
        if n % num:
            raise ValueError(f"n={n} not divisible by P={num}")
        kind, m_static = "ell", None
        shard2 = NamedSharding(mesh, P(axis, None))
        op_arrays = (
            jax.device_put(op.values, shard2),
            jax.device_put(op.indices, shard2),
        )
    else:
        raise TypeError(
            f"sharded_operator_cg_solve supports Poisson/Ell operators, "
            f"got {type(op).__name__}"
        )
    if config.precondition == "jacobi":
        d = op.diagonal()
        minv = jnp.where(d != 0, 1.0 / d, 1.0).astype(jnp.float32)
    else:
        minv = jnp.ones(n, jnp.float32)  # placeholder, unused when "none"
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rnorm, done = _sharded_operator_cg_jit(
        op_arrays,
        jax.device_put(b, shard1),
        jax.device_put(x0, shard1),
        jax.device_put(minv, shard1),
        mesh=mesh,
        tol=float(config.tol),
        maxiter=int(maxiter),
        safe_alpha=bool(config.safe_alpha),
        axis=axis,
        method=config.method,
        kind=kind,
        m=m_static,
        precondition=config.precondition,
        poly_degree=(
            config.poly_degree if config.precondition == "poly" else 0
        ),
    )
    return CGResult(x=x, iterations=k, residual_norm=rnorm, converged=done)


def distribute_system(
    A: np.ndarray,
    b: np.ndarray,
    x0: Optional[np.ndarray],
    mesh: Mesh,
    part: RowPartition,
    axis: str = ROWS_AXIS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pad and place (A, b, x0) row-block-sharded on the mesh.

    This is the reference's "data distribution" phase (``MPI_Bcast`` +
    ``MPI_Scatter``, ``parallel_cg.c:111-115``) as sharded device_put; timed
    separately by the bench harness to mirror its three-phase report.
    """
    Ap, bp, x0p = pad_system(A, b, x0, part)
    shard2d = NamedSharding(mesh, P(axis, None))
    shard1d = NamedSharding(mesh, P(axis))
    return (
        jax.device_put(Ap, shard2d),
        jax.device_put(bp, shard1d),
        jax.device_put(x0p, shard1d),
    )


def load_system_sharded(
    matrix_path: str,
    rhs_path: str,
    x0_path: Optional[str] = None,
    mesh: Optional[Mesh] = None,
    kernel: str = "auto",
):
    """Host-sharded loading: place (A, b, x0) row-block-sharded on the mesh
    with each shard's host callback parsing ONLY its own rows of the matrix
    file (``tpucg.io.textio.load_matrix_rows`` + the native range parser).

    The reference's rank 0 fscanf-s the entire matrix before scattering
    (``parallel_cg.c:100-108``) — its scalability ceiling (SURVEY.md §7 hard
    part d). Here no host ever materializes all of A: under multi-process
    JAX, ``jax.make_array_from_callback`` only invokes the callback for
    locally-addressable shards. Returns (A, b, x0, n) — pre-padded device
    arrays accepted directly by ``sharded_cg_solve(..., n=n)`` (same
    mesh/kernel), plus the logical system size.
    """
    from tpucg.io.textio import load_matrix_rows, load_vector

    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    num = mesh.devices.size
    backend = resolve_backend(kernel)
    b_host = load_vector(rhs_path)
    n = int(b_host.size)
    align = row_align(backend)
    part = RowPartition(n=n, num_shards=num, align=align)
    npad = part.n_padded

    def a_shard(index):
        rows = index[0]
        r0 = rows.start or 0
        r1 = rows.stop if rows.stop is not None else npad
        block = np.zeros((r1 - r0, npad), np.float32)
        ur1 = min(r1, n)
        if ur1 > r0:
            block[: ur1 - r0, :n] = load_matrix_rows(matrix_path, r0, ur1, n)
        for i in range(max(r0, n), r1):  # identity pad tail
            block[i - r0, i] = 1.0
        return block

    A = jax.make_array_from_callback(
        (npad, npad), NamedSharding(mesh, P(axis, None)), a_shard
    )
    bp = np.zeros(npad, np.float32)
    bp[:n] = b_host
    x0p = np.zeros(npad, np.float32)
    if x0_path is not None:
        x0p[:n] = load_vector(x0_path, n=n)
    shard1 = NamedSharding(mesh, P(axis))
    return (
        A,
        jax.device_put(bp, shard1),
        jax.device_put(x0p, shard1),
        n,
    )


def sharded_cg_solve(
    A,
    b,
    x0=None,
    mesh: Optional[Mesh] = None,
    config: Optional[CGConfig] = None,
    n: Optional[int] = None,
    **overrides,
) -> CGResult:
    """Solve A x = b with A row-block-sharded across the mesh.

    Accepts host (NumPy) arrays — they are padded so every shard has equal
    static shape (lifting the reference's ``ROWS % P == 0`` restriction,
    ``parallel_cg.c:86-90``) and distributed; or pre-sharded device arrays of
    already-padded shape (then padding/placement are skipped; pass ``n`` to
    trim the solution back to the logical size, e.g. after
    ``load_system_sharded``).
    """
    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    if mesh is None:
        mesh = make_mesh()
    backend = resolve_backend(config.kernel)
    if mesh.devices.ndim == 2:
        if n is not None:
            raise ValueError("n override is for pre-padded 1-D inputs")
        return _sharded2d_solve(A, b, x0, mesh, config, backend)
    axis = mesh.axis_names[0]
    num = mesh.devices.size

    A = np.asarray(A) if not isinstance(A, jax.Array) else A
    n_logical = n
    n = A.shape[0] if n_logical is None else n_logical
    align = row_align(backend)
    part = RowPartition(n=n, num_shards=num, align=align)
    if isinstance(A, jax.Array) and A.shape[0] == part.n_padded:
        Ad, bd, x0d = (
            A,
            jnp.asarray(b, jnp.float32),
            (
                jnp.zeros(part.n_padded, jnp.float32)
                if x0 is None
                else jnp.asarray(x0, jnp.float32)
            ),
        )
    else:
        Ad, bd, x0d = distribute_system(
            np.asarray(A, np.float32),
            np.asarray(b, np.float32),
            None if x0 is None else np.asarray(x0, np.float32),
            mesh,
            part,
            axis,
        )
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rnorm, done = _sharded_cg_jit(
        Ad, bd, x0d,
        mesh=mesh,
        strategy=config.strategy,
        backend=backend,
        tol=float(config.tol),
        maxiter=int(maxiter),
        safe_alpha=bool(config.safe_alpha),
        axis=axis,
        precondition=config.precondition,
        method=config.method,
        poly_degree=(
            config.poly_degree if config.precondition == "poly" else 0
        ),
    )
    if part.n_padded != n:
        x = x[:n]
    return CGResult(x=x, iterations=k, residual_norm=rnorm, converged=done)


def _sharded2d_solve(A, b, x0, mesh, config, backend) -> CGResult:
    A = np.asarray(A, np.float32)
    n = A.shape[0]
    align = 128 if backend == "pallas" else 1
    Ad, bd, x0d, npad = distribute_system_2d(
        A,
        np.asarray(b, np.float32),
        None if x0 is None else np.asarray(x0, np.float32),
        mesh,
        align=align,
    )
    # Jacobi diagonal computed on the host from the UN-permuted matrix
    # (identity pad tail -> 1.0), sharded like the vectors.
    if config.precondition == "jacobi":
        d = np.ones(npad, np.float32)
        d[:n] = np.diag(A).astype(np.float32)
        minv_host = np.where(d != 0, 1.0 / d, 1.0).astype(np.float32)
    else:
        minv_host = np.ones(npad, np.float32)
    r_ax, c_ax = mesh.axis_names
    minv = jax.device_put(
        minv_host, NamedSharding(mesh, P((r_ax, c_ax),))
    )
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rnorm, done = _sharded2d_cg_jit(
        Ad, bd, x0d, minv,
        mesh=mesh,
        backend=backend,
        tol=float(config.tol),
        maxiter=int(maxiter),
        safe_alpha=bool(config.safe_alpha),
        method=config.method,
        precondition=config.precondition,
        poly_degree=(
            config.poly_degree if config.precondition == "poly" else 0
        ),
    )
    if npad != n:
        x = x[:n]
    return CGResult(x=x, iterations=k, residual_norm=rnorm, converged=done)
