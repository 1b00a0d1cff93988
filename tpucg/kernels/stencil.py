"""Pallas 3-D 7-point stencil kernel (the Poisson matvec).

The XLA lowering of the concat-based stencil (``PoissonOperator.matvec``'s
fallback) materializes shifted temporaries — measured at ~9% of the HBM
speed-of-light at m=64 on v5e (29 us where ideal read-u + write-y traffic is
~2.5 us). This kernel computes y = 6u - sum(neighbors) in ONE fused pass over
a VMEM-resident grid.

Layout: the m^3 grid is carried as an (m, m*m) array — x-planes on sublanes,
(y, z) flattened on lanes — and ALL six neighbor terms are shifts in that one
layout: x-neighbors are sublane shifts, y-neighbors are lane shifts by m,
z-neighbors are lane shifts by 1 (with lane-index masks enforcing the
Dirichlet boundaries). No reshapes, no halo DMAs, no gather.

Applicability: (m*m) %% 128 == 0 (lane tiling) and the whole grid + a few
temporaries must fit VMEM (~16 MB per array cap -> m <= 160; covers the
benchmark grids m = 64/128). Larger grids take the XLA path; the distributed
slab solver (solver.sharded) has its own halo-exchange stencil.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucg.kernels.dispatch import interpret_mode

# The whole-grid blocks (u + y + shift temporaries ~ 19.5 MB at m=128)
# exceed the default 16 MB scoped-VMEM cap once the kernel is embedded in a
# larger program (observed: the chained-solve benchmark OOMed where the
# standalone matvec compiled); v5e has 128 MB VMEM and stencil_supported /
# slab_supported bound the actual footprint.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def stencil_supported(m: int) -> bool:
    return (m * m) % 128 == 0 and 2 <= m <= 160


def stencil_apply(u, m: int, z_id=None, y_id=None):
    """y = A u on the (m, m*m) layout — the full-grid 7-point body.

    Pure jnp on values, so it is usable both as a Pallas kernel body
    (``_poisson_kernel``) and inside a larger in-kernel loop
    (``kernels.fused._fused_stencil_cg_kernel``). Callers running it many
    times may pass precomputed ``z_id``/``y_id`` lane-coordinate masks to
    hoist the iotas out of their loop.
    """
    mm = m * m
    zero = jnp.zeros((), u.dtype)
    if z_id is None or y_id is None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (m, mm), 1)
        z_id = lane % m        # z coordinate within a row
        y_id = lane // m       # y coordinate

    acc = 6.0 * u
    # x-direction: sublane (plane) shifts; domain edge rows get zero planes.
    zplane = jnp.zeros((1, mm), u.dtype)
    acc = acc - jnp.concatenate([u[1:], zplane], axis=0)   # x+1
    acc = acc - jnp.concatenate([zplane, u[:-1]], axis=0)  # x-1
    # y-direction: lane shifts by m, masked at y boundaries.
    zcols_m = jnp.zeros((m, m), u.dtype)
    acc = acc - jnp.where(
        y_id == m - 1, zero, jnp.concatenate([u[:, m:], zcols_m], axis=1)
    )
    acc = acc - jnp.where(
        y_id == 0, zero, jnp.concatenate([zcols_m, u[:, :-m]], axis=1)
    )
    # z-direction: lane shifts by 1, masked at z boundaries.
    zcol_1 = jnp.zeros((m, 1), u.dtype)
    acc = acc - jnp.where(
        z_id == m - 1, zero, jnp.concatenate([u[:, 1:], zcol_1], axis=1)
    )
    acc = acc - jnp.where(
        z_id == 0, zero, jnp.concatenate([zcol_1, u[:, :-1]], axis=1)
    )
    return acc


def _poisson_kernel(m: int, u_ref, y_ref):
    y_ref[...] = stencil_apply(u_ref[...], m)


def slab_supported(m: int, mp: int) -> bool:
    """Slab variant fits when the lane tiling holds and ~5 slab-sized arrays
    fit VMEM (u, y, two shifted temporaries, masks)."""
    return (m * m) % 128 == 0 and mp >= 1 and 5 * (mp + 2) * m * m * 4 <= 10**8


def _poisson_slab_kernel(m: int, lo_ref, u_ref, hi_ref, y_ref):
    mm = m * m
    u = u_ref[...]       # (mp, mm) — this device's x-planes
    lo = lo_ref[...]     # (1, mm) plane below (zeros at the domain edge)
    hi = hi_ref[...]     # (1, mm) plane above
    mp = u.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (mp, mm), 1)
    z_id = lane % m
    y_id = lane // m
    zero = jnp.zeros((), u.dtype)

    acc = 6.0 * u
    acc = acc - jnp.concatenate([u[1:], hi], axis=0)   # x+1
    acc = acc - jnp.concatenate([lo, u[:-1]], axis=0)  # x-1
    zcols_m = jnp.zeros((mp, m), u.dtype)
    acc = acc - jnp.where(
        y_id == m - 1, zero, jnp.concatenate([u[:, m:], zcols_m], axis=1)
    )
    acc = acc - jnp.where(
        y_id == 0, zero, jnp.concatenate([zcols_m, u[:, :-m]], axis=1)
    )
    zcol_1 = jnp.zeros((mp, 1), u.dtype)
    acc = acc - jnp.where(
        z_id == m - 1, zero, jnp.concatenate([u[:, 1:], zcol_1], axis=1)
    )
    acc = acc - jnp.where(
        z_id == 0, zero, jnp.concatenate([zcol_1, u[:, :-1]], axis=1)
    )
    y_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("m",))
def poisson3d_slab_pallas(
    u_slab: jax.Array, halo_lo: jax.Array, halo_hi: jax.Array, m: int
) -> jax.Array:
    """Slab-local stencil for the distributed solver: ``u_slab`` is this
    device's (mp, m*m) planes; the halo planes come from the ppermute ring
    (``solver.sharded._poisson_halo_matvec``) and already carry zeros at the
    global Dirichlet edges, so the kernel needs no boundary masks in x.
    """
    mp = u_slab.shape[0]
    if not slab_supported(m, mp):
        raise ValueError(f"slab stencil unsupported for m={m}, mp={mp}")
    mm = m * m
    return pl.pallas_call(
        functools.partial(_poisson_slab_kernel, m),
        out_shape=jax.ShapeDtypeStruct((mp, mm), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=7 * mp * mm,
            bytes_accessed=2 * 4 * mp * mm,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(halo_lo.reshape(1, mm), u_slab, halo_hi.reshape(1, mm))


@functools.partial(jax.jit, static_argnames=("m",))
def poisson3d_pallas(u_flat: jax.Array, m: int) -> jax.Array:
    """y = A u for the 3-D 7-point Dirichlet Laplacian, one fused pass."""
    if not stencil_supported(m):
        raise ValueError(
            f"pallas stencil needs (m*m) % 128 == 0 and m <= 160, got m={m}; "
            "use the XLA fallback"
        )
    mm = m * m
    u = u_flat.reshape(m, mm)
    y = pl.pallas_call(
        functools.partial(_poisson_kernel, m),
        out_shape=jax.ShapeDtypeStruct((m, mm), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=7 * m * mm,
            bytes_accessed=2 * 4 * m * mm,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret_mode(),
    )(u)
    return y.reshape(m * mm)
