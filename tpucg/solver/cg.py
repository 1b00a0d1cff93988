"""The CG iteration as a jit-compiled ``lax.while_loop``.

Contract (reference ``serialConjugate.c:180-259``; SURVEY.md §3.5):

- float32 recurrence: r = p = b - A x0; rsold = r.r; then per iteration
  alpha = rsold / (p.Ap); x += alpha p; r -= alpha Ap; beta = r.r;
  STOP if sqrt(beta) < tol (checked after the x/r update, BEFORE the p
  update — on convergence p and rsold are left un-updated);
  else p = r + (beta/rsold) p; rsold = beta. At most n iterations
  (``serialConjugate.c:213``).

The whole loop is one XLA computation: no host round-trip per iteration (the
reference pays an MPI allreduce + host-side sqrt test every lap; here the
convergence test is a traced predicate inside the while_loop).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpucg.config import CGConfig
from tpucg.kernels.blas1 import fused_update
from tpucg.kernels.dispatch import resolve_backend
from tpucg.solver.operators import LinearOperator, as_operator


class CGResult(NamedTuple):
    """Solve outcome. ``iterations`` counts matvec loop laps, matching the
    reference's loop variable (2 for the shipped 2x2 system, 4 for the 4x4)."""

    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


class _State(NamedTuple):
    k: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rsold: jax.Array
    rslast: jax.Array  # most recent r.r (tracked for reporting)
    done: jax.Array


def cg_loop(
    matvec: Callable,
    dot: Callable,
    update: Callable,
    b: jax.Array,
    x0: jax.Array,
    *,
    tol: float,
    maxiter: int,
    safe_alpha: bool = True,
) -> _State:
    """Generic CG while_loop. ``matvec``/``dot``/``update`` abstract the
    execution model: serial closures here; psum-reducing closures under
    shard_map in ``tpucg.solver.sharded`` (where ``dot`` carries the
    MPI_Allreduce role of ``parallel_cg.c:287-313``)."""
    tol2 = jnp.float32(tol) ** 2
    r0 = b - matvec(x0)
    rs0 = dot(r0, r0)
    # The reference would divide 0/0 on an exact initial guess
    # (``serialConjugate.c:219-220``); we flag it converged at k=0 instead.
    done0 = rs0 < tol2
    state = _State(
        k=jnp.int32(0), x=x0, r=r0, p=r0, rsold=rs0, rslast=rs0, done=done0
    )

    def cond(s: _State):
        return jnp.logical_and(s.k < maxiter, jnp.logical_not(s.done))

    def body(s: _State):
        ap = matvec(s.p)
        pap = dot(s.p, ap)
        if safe_alpha:
            alpha = jnp.where(pap != 0, s.rsold / pap, jnp.float32(0))
        else:
            alpha = s.rsold / pap
        x, r, beta = update(s.x, s.r, s.p, ap, alpha)
        done = beta < tol2
        p = jnp.where(done, s.p, r + (beta / s.rsold) * s.p)
        rsold = jnp.where(done, s.rsold, beta)
        return _State(
            k=s.k + 1, x=x, r=r, p=p, rsold=rsold, rslast=beta, done=done
        )

    return jax.lax.while_loop(cond, body, state)


@functools.partial(
    jax.jit, static_argnames=("tol", "maxiter", "blas_backend", "safe_alpha")
)
def _cg_jit(op, b, x0, tol, maxiter, blas_backend, safe_alpha):
    matvec = op.matvec
    dot = lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32)
    update = functools.partial(fused_update, backend=blas_backend)
    s = cg_loop(
        matvec, dot, update, b, x0,
        tol=tol, maxiter=maxiter, safe_alpha=safe_alpha,
    )
    return CGResult(
        x=s.x,
        iterations=s.k,
        residual_norm=jnp.sqrt(s.rslast),
        converged=s.done,
    )


def cg_solve(
    A,
    b,
    x0=None,
    config: Optional[CGConfig] = None,
    **overrides,
) -> CGResult:
    """Solve the SPD system A x = b on the current device.

    ``A`` may be a dense array, a ``CSRMatrix``/``EllMatrix``, or any
    ``LinearOperator``. Equivalent to running ``serialConjugate.c`` (same
    recurrence, tolerance, and iteration cap), jitted end-to-end.
    """
    if config is None:
        config = CGConfig(**overrides)
    elif overrides:
        config = dataclasses_replace(config, **overrides)
    backend = resolve_backend(config.kernel)
    op = as_operator(A, backend=backend)
    n = op.n
    npad = op.padded_n
    b = jnp.asarray(b, dtype=jnp.float32)
    if b.shape != (n,):
        raise ValueError(f"b must have shape ({n},), got {b.shape}")
    x0 = (
        jnp.zeros(n, jnp.float32)
        if x0 is None
        else jnp.asarray(x0, dtype=jnp.float32)
    )
    if npad != n:
        # Identity-tail padding (see tpucg.io.partitioner): pad coordinates
        # start at the exact solution 0 and stay there.
        b = jnp.pad(b, (0, npad - n))
        x0 = jnp.pad(x0, (0, npad - n))
    maxiter = config.maxiter if config.maxiter is not None else n
    blas_backend = backend if npad % 128 == 0 else "xla"
    res = _cg_jit(
        op, b, x0, float(config.tol), int(maxiter), blas_backend,
        bool(config.safe_alpha),
    )
    if npad != n:
        res = res._replace(x=res.x[:n])
    return res


def dataclasses_replace(config: CGConfig, **overrides) -> CGConfig:
    import dataclasses

    return dataclasses.replace(config, **overrides)
