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

from tpucg.io.partitioner import pad_identity_tail, round_up
from tpucg.kernels.matvec import MATVEC_ALIGN, matvec
from tpucg.kernels.spmv import bsr_ell_spmv, dia_spmv, ell_spmv
from tpucg.sparse.formats import (
    BSRMatrix,
    CSRMatrix,
    DIAMatrix,
    EllMatrix,
    csr_to_ell,
)


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

    def diagonal(self) -> jax.Array:
        """diag(A), padded length — for the Jacobi preconditioner."""
        raise NotImplementedError(
            f"{type(self).__name__} does not expose a diagonal; "
            "precondition='jacobi' is unavailable for it"
        )

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
    def create(cls, A, backend: str = "xla", dtype=np.float32) -> "DenseOperator":
        """``dtype`` is the device STORAGE dtype of A: float32 (the reference
        contract), bfloat16 (halved HBM traffic, ~2x faster matvec; f32
        accumulation — an extension), or float64 (needs x64 mode)."""
        dtype = jnp.dtype(dtype)
        host_dtype = np.float32 if dtype == jnp.bfloat16 else dtype
        A = np.asarray(A, dtype=host_dtype)
        n = A.shape[0]
        if A.shape != (n, n):
            raise ValueError(f"A must be square, got {A.shape}")
        if backend == "pallas" and dtype not in (jnp.float32, jnp.bfloat16):
            backend = "xla"
        npad = round_up(n, np.lcm(*MATVEC_ALIGN)) if backend == "pallas" else n
        A = pad_identity_tail(A, npad)
        return cls(A=jnp.asarray(A, dtype=dtype), n=n, backend=backend)

    @property
    def padded_n(self) -> int:
        return self.A.shape[0]

    def matvec(self, x: jax.Array) -> jax.Array:
        return matvec(self.A, x, backend=self.backend)

    def diagonal(self) -> jax.Array:
        # Identity pad tail -> 1.0, safe to invert; bf16 storage upcast.
        return jnp.diagonal(self.A).astype(
            jnp.promote_types(self.A.dtype, jnp.float32)
        )


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

    def diagonal(self) -> jax.Array:
        rows = jax.lax.broadcasted_iota(
            self.indices.dtype, self.indices.shape, 0
        )
        return jnp.sum(
            jnp.where(self.indices == rows, self.values, 0.0), axis=1
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiaOperator(LinearOperator):
    """Diagonal-storage banded operator (device form of DIA).

    The TPU-fast general sparse path: SpMV is a static shift-and-add per
    diagonal (see ``kernels.spmv.dia_spmv``), no gather. Offsets are static
    metadata so XLA sees fixed pad/slice shapes.
    """

    data: jax.Array  # (ndiag, n)
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_dia(cls, dia: DIAMatrix) -> "DiaOperator":
        return cls(
            data=jnp.asarray(dia.data),
            offsets=tuple(int(o) for o in dia.offsets),
            n=dia.shape[0],
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        return dia_spmv(self.data, self.offsets, x)

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros(self.n, self.data.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsrOperator(LinearOperator):
    """Block-ELL sparse operator (device form of BSR).

    Block rows are padded to a uniform width L of (bs x bs) blocks — static
    shapes for XLA, with dense per-block tiles (see ``kernels.spmv.
    bsr_ell_spmv``). Padded blocks are all-zero with block-column 0.
    """

    values: jax.Array   # (nbr, L, bs, bs)
    indices: jax.Array  # (nbr, L) int32
    n: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_bsr(cls, bsr: BSRMatrix) -> "BsrOperator":
        bs = bsr.blocksize
        nbr = bsr.shape[0] // bs
        lengths = bsr.block_row_lengths
        L = max(1, int(lengths.max()) if nbr else 1)
        values = np.zeros((nbr, L, bs, bs), dtype=bsr.data.dtype)
        indices = np.zeros((nbr, L), dtype=np.int32)
        within = (
            np.arange(bsr.nnzb, dtype=np.int64)
            - np.repeat(bsr.indptr[:-1], lengths)
        )
        rows = np.repeat(np.arange(nbr, dtype=np.int64), lengths)
        values[rows, within] = bsr.data
        indices[rows, within] = bsr.indices
        return cls(
            values=jnp.asarray(values),
            indices=jnp.asarray(indices),
            n=bsr.shape[0],
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        return bsr_ell_spmv(self.values, self.indices, x)

    def diagonal(self) -> jax.Array:
        nbr, L, bs, _ = self.values.shape
        rows = jax.lax.broadcasted_iota(self.indices.dtype, (nbr, L), 0)
        on_diag = (self.indices == rows)[..., None]  # (nbr, L, 1)
        diag_blocks = jnp.sum(
            jnp.where(
                on_diag,
                jnp.diagonal(self.values, axis1=2, axis2=3),
                0.0,
            ),
            axis=1,
        )  # (nbr, bs)
        return diag_blocks.reshape(nbr * bs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoissonOperator(LinearOperator):
    """Matrix-free 3-D 7-point Laplacian on an m^3 grid (Dirichlet).

    Identical to ``tpucg.io.generator.poisson3d_csr`` but applied as a
    stencil: 6*u - sum(in-grid neighbors), no gather, no stored matrix — the
    speed-of-light form on TPU. When the grid is lane-tileable the matvec is
    the single-pass Pallas kernel (``kernels.stencil``); otherwise the XLA
    concat form (which materializes shifted temporaries, ~6x more traffic).
    """

    m: int = dataclasses.field(metadata=dict(static=True))
    kernel: str = dataclasses.field(default="auto", metadata=dict(static=True))

    @property
    def n(self) -> int:  # type: ignore[override]
        return self.m ** 3

    def matvec(self, x: jax.Array) -> jax.Array:
        from tpucg.kernels.stencil import poisson3d_pallas, stencil_supported

        # The Pallas kernel is float32-only; f64 (and any other dtype) takes
        # the XLA form, which is dtype-generic.
        if (
            self.kernel in ("auto", "pallas")
            and stencil_supported(self.m)
            and x.dtype == jnp.float32
        ):
            return poisson3d_pallas(x, self.m)
        if self.kernel == "pallas":
            raise ValueError(
                f"pallas stencil unsupported for m={self.m}/dtype={x.dtype} "
                "(needs (m*m) % 128 == 0 and float32)"
            )
        return self._matvec_xla(x)

    def _matvec_xla(self, x: jax.Array) -> jax.Array:
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

    def diagonal(self) -> jax.Array:
        return jnp.full(self.n, 6.0, jnp.float32)


def as_operator(A, backend: str = "xla", dtype=np.float32) -> LinearOperator:
    """Coerce a dense array / CSR / ELL / BSR / operator into a LinearOperator.

    ``dtype`` applies to dense storage only (sparse containers carry their own
    data dtype; pre-built operators are returned unchanged).
    """
    if isinstance(A, LinearOperator):
        return A
    if isinstance(A, CSRMatrix):
        return EllOperator.from_csr(A)
    if isinstance(A, EllMatrix):
        return EllOperator.from_ell(A)
    if isinstance(A, BSRMatrix):
        return BsrOperator.from_bsr(A)
    if isinstance(A, DIAMatrix):
        return DiaOperator.from_dia(A)
    arr = np.asarray(A) if not isinstance(A, jax.Array) else A
    if arr.ndim == 2:
        return DenseOperator.create(arr, backend=backend, dtype=dtype)
    raise TypeError(f"cannot interpret {type(A)!r} as a linear operator")
