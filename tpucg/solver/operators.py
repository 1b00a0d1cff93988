"""Linear operators — the abstraction CG actually needs.

The reference's CG is welded to a dense row-major matrix (``matVec``,
``serialConjugate.c:109-120``). tpucg decouples the iteration from the
operator: anything with a ``matvec`` is solvable — dense (Pallas GEMV),
ELLPACK sparse (gather SpMV), or matrix-free stencils (7-point Poisson).
Operators are registered JAX pytrees so they flow through ``jit`` /
``lax.while_loop`` with their arrays as traced leaves and their structure
(shapes, backend choice) as static metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpucg.io.partitioner import round_up
from tpucg.kernels.matvec import MATVEC_ALIGN, matvec
from tpucg.kernels.spmv import ell_spmv
from tpucg.sparse.formats import CSRMatrix, EllMatrix, csr_to_ell


class LinearOperator:
    """Abstract SPD operator. Subclasses: DenseOperator, EllOperator,
    PoissonOperator, or any user pytree with ``matvec`` and ``n``."""

    n: int  # logical system size

    @property
    def padded_n(self) -> int:
        """Device-side vector length (>= n; kernels may require alignment)."""
        return self.n

    def matvec(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseOperator(LinearOperator):
    """Dense SPD matrix. Pads once at construction to the Pallas alignment
    contract with an identity tail block (see ``tpucg.io.partitioner``), so the
    hot matvec never re-pads."""

    A: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    backend: str = dataclasses.field(default="xla", metadata=dict(static=True))

    @classmethod
    def create(cls, A, backend: str = "xla") -> "DenseOperator":
        A = np.asarray(A, dtype=np.float32)
        n = A.shape[0]
        if A.shape != (n, n):
            raise ValueError(f"A must be square, got {A.shape}")
        npad = round_up(n, np.lcm(*MATVEC_ALIGN)) if backend == "pallas" else n
        if npad != n:
            Ap = np.zeros((npad, npad), dtype=np.float32)
            Ap[:n, :n] = A
            Ap[np.arange(n, npad), np.arange(n, npad)] = 1.0
            A = Ap
        return cls(A=jnp.asarray(A), n=n, backend=backend)

    @property
    def padded_n(self) -> int:
        return self.A.shape[0]

    def matvec(self, x: jax.Array) -> jax.Array:
        return matvec(self.A, x, backend=self.backend)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllOperator(LinearOperator):
    """ELLPACK sparse operator (device form of CSR/COO)."""

    values: jax.Array
    indices: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_csr(cls, csr: CSRMatrix) -> "EllOperator":
        ell = csr_to_ell(csr)
        return cls.from_ell(ell)

    @classmethod
    def from_ell(cls, ell: EllMatrix) -> "EllOperator":
        return cls(
            values=jnp.asarray(ell.values),
            indices=jnp.asarray(ell.indices),
            n=ell.shape[0],
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        return ell_spmv(self.values, self.indices, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoissonOperator(LinearOperator):
    """Matrix-free 3-D 7-point Laplacian on an m^3 grid (Dirichlet).

    Identical to ``tpucg.io.generator.poisson3d_csr`` but applied as a stencil:
    6*u - sum(in-grid neighbors), no gather, no stored matrix — the
    speed-of-light form on TPU (pure VPU + HBM streaming of u).
    """

    m: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n(self) -> int:  # type: ignore[override]
        return self.m ** 3

    def matvec(self, x: jax.Array) -> jax.Array:
        m = self.m
        u = x.reshape(m, m, m)
        y = 6.0 * u
        zeros = jnp.zeros_like(u[:1])
        y = y - jnp.concatenate([u[1:], zeros], axis=0)
        y = y - jnp.concatenate([zeros, u[:-1]], axis=0)
        zeros = jnp.zeros_like(u[:, :1])
        y = y - jnp.concatenate([u[:, 1:], zeros], axis=1)
        y = y - jnp.concatenate([zeros, u[:, :-1]], axis=1)
        zeros = jnp.zeros_like(u[:, :, :1])
        y = y - jnp.concatenate([u[:, :, 1:], zeros], axis=2)
        y = y - jnp.concatenate([zeros, u[:, :, :-1]], axis=2)
        return y.reshape(-1)


def as_operator(A, backend: str = "xla") -> LinearOperator:
    """Coerce a dense array / CSR / ELL / operator into a LinearOperator."""
    if isinstance(A, LinearOperator):
        return A
    if isinstance(A, CSRMatrix):
        return EllOperator.from_csr(A)
    if isinstance(A, EllMatrix):
        return EllOperator.from_ell(A)
    arr = np.asarray(A) if not isinstance(A, jax.Array) else A
    if arr.ndim == 2:
        return DenseOperator.create(arr, backend=backend)
    raise TypeError(f"cannot interpret {type(A)!r} as a linear operator")
