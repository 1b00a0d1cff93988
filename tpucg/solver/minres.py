"""MINRES — symmetric INDEFINITE systems (extension beyond the reference).

The reference (and ``cg_solve``) requires SPD: CG's ``alpha = r.r / p.Ap``
divides by a quadratic form that an indefinite matrix can make zero or
negative, silently breaking the recurrence (the reference would emit NaNs,
``serialConjugate.c:219-220``). MINRES (Paige & Saunders 1975) minimizes
||b - A x|| over the same Krylov space using a Lanczos three-term
recurrence + Givens QR, and requires only symmetry.

TPU shape: identical to CG's — one matvec, two dots, and a handful of
axpy-scale vector ops per lap, all inside one jitted ``lax.while_loop``
with static shapes; the Givens scalars live in registers. Works with any
``LinearOperator`` (dense Pallas/XLA GEMV, DIA, stencil, ...).

Recurrence (textbook form): with ``v_1 = r_0/beta_1`` and |eta| carrying
the EXACT residual norm (``||r_k|| = beta_1 * s_1 ... s_k``), each lap

    alpha = v.Av ;  v_next = (Av - alpha v - beta v_prev)/beta_next
    Givens: delta/rho1..3, gamma/sigma pairs
    w = (v - rho3 w2 - rho2 w1)/rho1 ;  x += gamma1 eta w ;  eta *= -sigma1

Stopping: |eta| < tol (the same absolute-||r|| contract as CG); the final
TRUE residual is recomputed for honest reporting, like ``pipelined_cg``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpucg.config import CGConfig
from tpucg.kernels.blas1 import dot_xla
from tpucg.kernels.dispatch import resolve_backend
from tpucg.solver.cg import CGResult
from tpucg.solver.operators import as_operator


class _MinresState(NamedTuple):
    k: jax.Array
    x: jax.Array
    v_prev: jax.Array
    v: jax.Array
    beta: jax.Array     # beta_j (subdiagonal entering this lap)
    w1: jax.Array       # w_{j-1}
    w2: jax.Array       # w_{j-2}
    gamma0: jax.Array
    gamma1: jax.Array
    sigma0: jax.Array
    sigma1: jax.Array
    eta: jax.Array      # signed; |eta| = ||r_{j-1}||
    done: jax.Array


def minres_loop(matvec, dot, b, x0, *, tol, maxiter) -> _MinresState:
    """Generic MINRES while_loop. ``matvec``/``dot`` abstract the execution
    model exactly like ``cg_loop``'s: serial closures, or psum-reducing
    closures under shard_map (``sharded_minres_solve``)."""
    f32 = b.dtype
    tolv = jnp.asarray(tol, f32)

    r0 = b - matvec(x0)
    beta1 = jnp.sqrt(dot(r0, r0))
    safe_b1 = jnp.where(beta1 > 0, beta1, jnp.ones_like(beta1))
    zero = jnp.zeros_like(b)
    one = jnp.ones((), f32)
    nil = jnp.zeros((), f32)
    s0 = _MinresState(
        k=jnp.int32(0), x=x0, v_prev=zero, v=r0 / safe_b1,
        beta=nil, w1=zero, w2=zero,
        gamma0=one, gamma1=one, sigma0=nil, sigma1=nil,
        eta=beta1, done=beta1 < tolv,
    )

    def cond(s):
        return jnp.logical_and(s.k < maxiter, jnp.logical_not(s.done))

    def body(s):
        av = matvec(s.v)
        alpha = dot(s.v, av)
        y = av - alpha * s.v - s.beta * s.v_prev
        beta_next = jnp.sqrt(dot(y, y))
        # Lanczos breakdown (beta_next ~ 0) means the Krylov space is
        # invariant: this lap's x update is exact; the guarded division
        # only protects the (unused) next v.
        v_next = y / jnp.where(beta_next > 0, beta_next,
                               jnp.ones_like(beta_next))
        delta = s.gamma1 * alpha - s.gamma0 * s.sigma1 * s.beta
        rho1 = jnp.sqrt(delta * delta + beta_next * beta_next)
        rho1 = jnp.where(rho1 > 0, rho1, jnp.ones_like(rho1))
        rho2 = s.sigma1 * alpha + s.gamma0 * s.gamma1 * s.beta
        rho3 = s.sigma0 * s.beta
        gamma1 = delta / rho1
        sigma1 = beta_next / rho1
        w = (s.v - rho3 * s.w2 - rho2 * s.w1) / rho1
        x = s.x + (gamma1 * s.eta) * w
        eta = -sigma1 * s.eta
        done = jnp.abs(eta) < tolv
        return _MinresState(
            k=s.k + 1, x=x, v_prev=s.v, v=v_next, beta=beta_next,
            w1=w, w2=s.w1, gamma0=s.gamma1, gamma1=gamma1,
            sigma0=s.sigma1, sigma1=sigma1, eta=eta, done=done,
        )

    return jax.lax.while_loop(cond, body, s0)


@functools.partial(
    jax.jit, static_argnames=("tol", "maxiter", "blas_backend")
)
def _minres_jit(op, b, x0, tol, maxiter, blas_backend):
    del blas_backend  # vector ops are plain fused XLA here
    matvec, dot = op.matvec, dot_xla
    s = minres_loop(matvec, dot, b, x0, tol=tol, maxiter=maxiter)
    # Honest reporting: the recurrence's |eta| drifts from the true
    # residual in f32; recompute it once (same practice as pipelined CG).
    r = b - matvec(s.x)
    rr = dot(r, r)
    tolv = jnp.asarray(tol, b.dtype)
    return CGResult(
        x=s.x, iterations=s.k, residual_norm=jnp.sqrt(rr),
        converged=rr < tolv * tolv,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "strategy", "backend", "tol", "maxiter",
                     "axis"),
)
def _sharded_minres_jit(A, b, x0, *, mesh, strategy, backend, tol, maxiter,
                        axis):
    from jax.sharding import PartitionSpec as P

    from tpucg.solver.sharded import _make_matvec, _make_reductions

    num = mesh.devices.size
    tolv = jnp.asarray(tol, jnp.float32)

    def solve(A_blk, b_blk, x_blk):
        mv = _make_matvec(A_blk, strategy, num, backend, axis)
        dot, _, _ = _make_reductions(axis)
        s = minres_loop(mv, dot, b_blk, x_blk, tol=tol, maxiter=maxiter)
        r = b_blk - mv(s.x)
        rr = dot(r, r)
        return s.x, s.k, jnp.sqrt(rr), rr < tolv * tolv

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P()),
        check_vma=(backend != "pallas"),
    )(A, b, x0)


def sharded_minres_solve(
    A,
    b,
    x0=None,
    mesh=None,
    config: Optional[CGConfig] = None,
    **overrides,
) -> CGResult:
    """MINRES with A row-block-sharded across the mesh — the distributed
    composition of :func:`minres_solve` (same allgather/overlap strategy
    arms and psum scalar reductions as ``sharded_cg_solve``)."""
    import numpy as np
    from dataclasses import replace as dataclasses_replace

    from tpucg.comm.mesh import make_mesh
    from tpucg.io.partitioner import RowPartition
    from tpucg.solver.sharded import distribute_system, row_align

    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    if config.method != "cg":
        raise ValueError("sharded_minres_solve has no method variants")
    if config.precondition != "none":
        raise ValueError("sharded_minres_solve is unpreconditioned")
    if mesh is None:
        mesh = make_mesh()
    if mesh.devices.ndim != 1:
        raise ValueError("MINRES is supported on 1-D meshes")
    axis = mesh.axis_names[0]
    backend = resolve_backend(config.kernel)
    A = np.asarray(A, np.float32)
    n = A.shape[0]
    part = RowPartition(n=n, num_shards=mesh.devices.size,
                        align=row_align(backend))
    Ad, bd, x0d = distribute_system(
        A, np.asarray(b, np.float32),
        None if x0 is None else np.asarray(x0, np.float32),
        mesh, part, axis,
    )
    maxiter = config.maxiter if config.maxiter is not None else n
    x, k, rn, done = _sharded_minres_jit(
        Ad, bd, x0d, mesh=mesh, strategy=config.strategy, backend=backend,
        tol=float(config.tol), maxiter=int(maxiter), axis=axis,
    )
    res = CGResult(x=x, iterations=k, residual_norm=rn, converged=done)
    if part.n_padded != n:
        res = res._replace(x=res.x[:n])
    return res


def minres_solve(
    A,
    b,
    x0=None,
    config: Optional[CGConfig] = None,
    **overrides,
) -> CGResult:
    """Solve the symmetric (possibly INDEFINITE) system A x = b by MINRES.

    Same calling convention and stopping contract as ``cg_solve``
    (absolute ``||r|| < tol``, <= maxiter laps, float32), but only
    symmetry — not positive-definiteness — is required. On SPD systems
    it matches CG's solution (CG remains slightly cheaper per lap).
    """
    from dataclasses import replace as dataclasses_replace

    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    if config.method != "cg":
        raise ValueError("minres_solve has no method variants")
    if config.precondition != "none":
        raise ValueError(
            "minres_solve is unpreconditioned (MINRES preconditioning "
            "needs an SPD M; use cg_solve for SPD systems)"
        )
    if jnp.dtype(config.dtype) != jnp.float32:
        raise ValueError("minres_solve is float32-only")
    backend = resolve_backend(config.kernel)
    op = as_operator(A, backend=backend)
    n, npad = op.n, op.padded_n
    b = jnp.asarray(b, jnp.float32)
    if b.shape != (n,):
        raise ValueError(f"b must have shape ({n},), got {b.shape}")
    x0 = jnp.zeros(n, jnp.float32) if x0 is None else jnp.asarray(
        x0, jnp.float32)
    if npad != n:
        b = jnp.pad(b, (0, npad - n))
        x0 = jnp.pad(x0, (0, npad - n))
    maxiter = config.maxiter if config.maxiter is not None else n
    res = _minres_jit(op, b, x0, float(config.tol), int(maxiter), backend)
    if npad != n:
        res = res._replace(x=res.x[:n])
    return res
