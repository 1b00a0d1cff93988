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

    def diagonal_blocks(self, bs: int) -> jax.Array:
        """The (ceil(padded_n/bs), bs, bs) diagonal blocks of A — for the
        block-Jacobi preconditioner. Rows past padded_n (when bs does not
        divide it) are identity. Exact extraction is format-specific
        (probing with strided basis vectors aliases off-block entries for
        ANY nonzero bandwidth), so only formats that store their
        diagonal-block entries addressably implement it."""
        raise NotImplementedError(
            f"{type(self).__name__} does not expose diagonal blocks; "
            "precondition='block_jacobi' is unavailable for it"
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)


def _blocks_from_diag_data(offsets, data, bs: int) -> jax.Array:
    """Assemble (nb, bs, bs) diagonal blocks from DIA-style storage:
    ``data[d, i] = A[i, i + offsets[d]]`` (canonical (ndiag, N)). An entry
    lands in a block iff its row AND column share the block, i.e.
    r = i mod bs satisfies 0 <= r + off < bs — offsets with |off| >= bs
    never contribute. Rows in the bs-alignment tail (>= N) get identity."""
    ndiag, N = len(offsets), data.shape[1]
    nb = -(-N // bs)
    dtype = jnp.promote_types(data.dtype, jnp.float32)
    if nb * bs != N:
        data = jnp.pad(data, ((0, 0), (0, nb * bs - N)))
    blocks = jnp.zeros((nb, bs, bs), dtype)
    for d in range(ndiag):
        off = int(offsets[d])
        if abs(off) >= bs:
            continue
        rs = np.arange(max(0, -off), bs - max(0, off))
        blocks = blocks.at[:, rs, rs + off].set(
            data[d].reshape(nb, bs)[:, rs].astype(dtype)
        )
    if nb * bs != N:
        tail = jnp.arange(nb * bs).reshape(nb, bs) >= N
        blocks = jnp.where(
            tail[:, :, None] | tail[:, None, :], 0.0, blocks
        ) + jnp.eye(bs, dtype=dtype)[None] * tail[:, :, None]
    return blocks


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
        A = np.asarray(A)
        if jnp.dtype(A.dtype) != dtype:
            # bf16 has no native NumPy repr; stage in f32 (ml_dtypes-typed
            # bf16 input passes through, halving the host->device transfer
            # for the large-n benchmarks).
            A = A.astype(np.float32 if dtype == jnp.bfloat16 else dtype)
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

    def diagonal_blocks(self, bs: int) -> jax.Array:
        # One-time setup gather of (nb, bs, bs) entries; out-of-range tail
        # indices (bs not dividing padded_n) clamp, get zeroed by the
        # validity mask, and take identity diagonals.
        N = self.padded_n
        nb = -(-N // bs)
        dtype = jnp.promote_types(self.A.dtype, jnp.float32)
        idx = jnp.arange(nb * bs)
        valid = (idx < N).reshape(nb, bs)
        idxc = jnp.minimum(idx, N - 1).reshape(nb, bs)
        blocks = self.A[idxc[:, :, None], idxc[:, None, :]].astype(dtype)
        both = valid[:, :, None] & valid[:, None, :]
        blocks = jnp.where(both, blocks, 0.0)
        return blocks + jnp.eye(bs, dtype=dtype)[None] * (
            ~valid[:, :, None]
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
    diagonal, no gather. Offsets are static metadata so the compiler sees
    fixed shift shapes. Two backends (see ``kernels.spmv``):

    - ``pallas`` (default where supported): ONE fused in-VMEM pass over all
      diagonals — the XLA lowering materializes a shifted HBM temporary per
      diagonal, ~3x the streaming traffic (measured 90.7 us vs an 11.5 us
      roofline at m=64 Poisson on v5e);
    - ``xla``: the concat/pad form, dtype-generic, any shape.

    ``from_dia`` pads the flat length to a 128 multiple (identity tail on
    the main diagonal) so the Pallas lane tiling applies; solvers handle
    ``padded_n != n`` exactly like the dense operator's padding.
    """

    # Canonical (ndiag, padded_n), or — when ``interleaved`` — the Pallas
    # kernel's (padded_n//128, ndiag*128) packing (kernels.spmv.dia_interleave).
    data: jax.Array
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    backend: str = dataclasses.field(default="auto", metadata=dict(static=True))
    interleaved: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @classmethod
    def from_dia(cls, dia: DIAMatrix, backend: str = "auto",
                 storage_dtype=np.float32) -> "DiaOperator":
        """``storage_dtype=bfloat16`` stores the diagonal slab in bfloat16 —
        half the HBM footprint and streaming bytes of the SpMV (the Pallas
        kernel upcasts in-vreg and accumulates in f32; the same
        storage-dtype extension as ``DenseOperator.create``). The solve
        satisfies the f32 contract on the bf16-rounded system."""
        from tpucg.kernels.spmv import LANE, dia_interleave, dia_supported

        if jnp.dtype(storage_dtype) not in (jnp.float32, jnp.bfloat16):
            raise ValueError(
                f"storage_dtype must be float32 or bfloat16, "
                f"got {storage_dtype}"
            )
        data = np.asarray(dia.data)
        if jnp.dtype(storage_dtype) == jnp.bfloat16:
            data = data.astype(np.float32)  # canonical source for the cast
        n = dia.shape[0]
        offsets = tuple(int(o) for o in dia.offsets)
        # Like DenseOperator.create, padding is a Pallas-alignment concern:
        # backend="xla" keeps the logical shape (shift-and-add needs none).
        npad = round_up(n, LANE) if backend != "xla" else n
        if npad != n and 0 in offsets:
            padded = np.zeros((data.shape[0], npad), dtype=data.dtype)
            padded[:, :n] = data
            padded[offsets.index(0), n:] = 1.0  # identity tail (partitioner)
            data = padded
        # One layout, chosen once: the interleaved packing when the Pallas
        # kernel applies (duplicating both layouts would double HBM).
        interleaved = (
            backend != "xla"
            and data.dtype == np.float32
            and dia_supported(data.shape[1], offsets)
        )
        if backend == "pallas" and not interleaved:
            raise ValueError(
                f"pallas DIA unsupported for n={data.shape[1]}/"
                f"offsets={offsets}/dtype={data.dtype}"
            )
        if interleaved:
            data = dia_interleave(data)
        if jnp.dtype(storage_dtype) == jnp.bfloat16:
            import ml_dtypes

            data = np.asarray(data).astype(ml_dtypes.bfloat16)
        return cls(
            data=jnp.asarray(data), offsets=offsets, n=n, backend=backend,
            interleaved=interleaved,
        )

    @property
    def ndiag(self) -> int:
        return len(self.offsets)

    @property
    def padded_n(self) -> int:
        if self.interleaved:
            from tpucg.kernels.spmv import LANE

            return self.data.shape[0] * LANE
        return self.data.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        from tpucg.kernels.dispatch import resolve_backend
        from tpucg.kernels.spmv import (
            dia_spmv_interleaved_xla,
            dia_spmv_pallas,
        )

        if not self.interleaved:
            return dia_spmv(self.data, self.offsets, x)
        # "auto" defers to the platform default (off-TPU, interpreted Pallas
        # would be orders of magnitude slower than XLA); "pallas" forces it.
        want = (
            resolve_backend("auto") if self.backend == "auto" else self.backend
        )
        if want == "pallas" and x.dtype == jnp.float32:
            return dia_spmv_pallas(self.data, self.offsets, x)
        return dia_spmv_interleaved_xla(self.data, self.offsets, x)

    def diagonal(self) -> jax.Array:
        from tpucg.kernels.spmv import LANE

        # bf16 storage upcasts (1/d must be f32); f64 stays f64.
        up = jnp.promote_types(self.data.dtype, jnp.float32)
        if 0 not in self.offsets:
            return jnp.zeros(self.padded_n, up)
        d0 = self.offsets.index(0)
        if self.interleaved:
            return jax.lax.dynamic_slice(
                self.data, (0, d0 * LANE), (self.data.shape[0], LANE)
            ).reshape(-1).astype(up)
        return self.data[d0].astype(up)

    def diagonal_blocks(self, bs: int) -> jax.Array:
        data = self.data
        if self.interleaved:
            # One-time setup (host round-trip is fine and keeps the
            # inverse transpose in its single canonical home beside the
            # packer, kernels.spmv.dia_deinterleave).
            from tpucg.kernels.spmv import dia_deinterleave

            data = jnp.asarray(dia_deinterleave(data))
        return _blocks_from_diag_data(self.offsets, data, bs)


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

    @property
    def padded_n(self) -> int:
        # n may be logical (< stored rows) when the skeleton was
        # identity-padded to the blocksize (best_sparse_operator).
        nbr, _, bs, _ = self.values.shape
        return nbr * bs

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
class WellOperator(LinearOperator):
    """Windowed gather-ELL operator — the TPU-honest irregular-sparse path.

    Device form of ``tpucg.sparse.well.WellMatrix``: nonzeros packed into
    128-slot sublane rows whose columns share one 128-wide window, applied
    by x-row-gather + Mosaic lane-gather + one-hot MXU routing (see
    ``kernels.gather_spmv``). Replaces scalar-gather ELL as the fallback for
    matrices that are neither banded (DIA) nor blocky (BSR).
    """

    vals: jax.Array   # (NS, 128) float32 or bfloat16 (storage_dtype)
    lidx: jax.Array   # (NS, 128) int8
    gidl: jax.Array   # (NB, BS) int32
    wrow: jax.Array   # (NS/8,) int32 — window id per 8-sublane chunk
    sgb: jax.Array    # (NB,) int32
    dvec: jax.Array   # (padded_n,) float32 — diag(A), host-built at setup
    n: int = dataclasses.field(metadata=dict(static=True))
    bg: int = dataclasses.field(metadata=dict(static=True))
    nsg: int = dataclasses.field(metadata=dict(static=True))
    backend: str = dataclasses.field(default="auto", metadata=dict(static=True))
    # Optional (nb, bs, bs) raw diagonal blocks for block Jacobi, built
    # host-side from the source CSR (the packed WELL slabs are not
    # addressable by (row, col); see ``diagonal_blocks``).
    dblk: jax.Array = None

    @classmethod
    def from_csr(cls, csr: CSRMatrix, backend: str = "auto",
                 storage_dtype=np.float32, pc_block_size=None,
                 **well_kwargs) -> "WellOperator":
        """``pc_block_size`` pre-extracts the (nb, bs, bs) diagonal blocks
        from the CSR coordinates so ``precondition='block_jacobi'`` works
        on the WELL path (the packed device form loses addressability)."""
        from tpucg.sparse.formats import csr_diagonal_blocks
        from tpucg.sparse.well import csr_to_well

        if csr.shape[0] != csr.shape[1]:
            raise ValueError(f"WellOperator needs a square matrix, got {csr.shape}")
        dblk = None
        if pc_block_size is not None:
            dblk = jnp.asarray(csr_diagonal_blocks(
                csr, int(pc_block_size), npad=round_up(csr.shape[0], 128)
            ))
        return cls.from_well(csr_to_well(csr, **well_kwargs),
                             backend=backend, storage_dtype=storage_dtype,
                             dblk=dblk)

    @classmethod
    def from_well(cls, well, backend: str = "auto",
                  storage_dtype=np.float32, dblk=None) -> "WellOperator":
        """``storage_dtype=bfloat16`` stores the packed VALUES in bfloat16
        (3.5 streamed bytes per slot instead of 5.5 — the value slab is
        the dominant stream; lane indices stay int8, the gathered window
        f32); products upcast in-vreg and accumulate in f32. The solve
        satisfies the f32 contract on the bf16-rounded system."""
        if jnp.dtype(storage_dtype) not in (jnp.float32, jnp.bfloat16):
            raise ValueError(
                f"storage_dtype must be float32 or bfloat16, "
                f"got {storage_dtype}"
            )
        vals = well.vals
        if jnp.dtype(storage_dtype) == jnp.bfloat16:
            import ml_dtypes

            vals = np.asarray(vals, np.float32).astype(ml_dtypes.bfloat16)
        return cls(
            vals=jnp.asarray(vals),
            lidx=jnp.asarray(well.lidx),
            gidl=jnp.asarray(well.gidl),
            wrow=jnp.asarray(well.wrow),
            sgb=jnp.asarray(well.sgb),
            dvec=jnp.asarray(well.diagonal()),
            n=well.shape[0],
            bg=well.groups_per_super,
            nsg=well.n_supergroups,
            backend=backend,
            dblk=dblk,
        )

    @property
    def padded_n(self) -> int:
        # Rows [n, padded_n) carry the builder's identity tail.
        return round_up(self.n, 128)

    @property
    def n_groups(self) -> int:
        return self.padded_n // 128

    def matvec(self, x: jax.Array) -> jax.Array:
        import jax as _jax

        from tpucg.kernels.dispatch import resolve_backend
        from tpucg.kernels.gather_spmv import well_spmv, well_spmv_xla

        x2 = x.reshape(self.n_groups, 128)
        want = (
            resolve_backend("auto") if self.backend == "auto" else self.backend
        )
        use_pallas = want == "pallas" and x.dtype == jnp.float32
        if not use_pallas and _jax.default_backend() == "tpu":
            # The scatter-add in the XLA fallback aborts the TPU compiler
            # (fusion of a lane-gather into SortedScatterEmitter fails a
            # CHECK); the fallback exists for CPU/interpret runs only.
            raise ValueError(
                "the WELL XLA fallback (scatter-add) is not TPU-compilable; "
                "use backend='pallas' (float32) on TPU"
            )
        fn = well_spmv if use_pallas else well_spmv_xla
        y2 = fn(self.vals, self.lidx, self.gidl, self.wrow, self.sgb, x2,
                bg=self.bg, nsg=self.nsg)
        return y2.reshape(-1)[: self.padded_n]

    def matvec_multi(self, X: jax.Array) -> jax.Array:
        """A @ X for X (padded_n, k) — the batched SpMM the multi/block
        solvers apply per lap.

        Implementation: ``vmap`` of the single-RHS Pallas kernel. That is
        a MEASURED choice, not a shortcut: a hand-fused SpMM kernel
        (matrix streamed once, (k*128)-wide window gathers, scratch +
        one wide one-hot matmul) was built and timed against it on chip
        and LOST everywhere — 450-488 us vs 244-371 us at n=100k k=8,
        614 vs 253 us/RHS at n=1M k=8. Mosaic's kernel batching adds the
        lane axis as the MINOR grid dimension and skips re-fetching
        blocks whose index-map output is unchanged between consecutive
        grid steps, so the vals/lidx stream is already amortized across
        lanes (per-RHS apply cost drops 1.4x at k=2 and ~2-3x at k=8
        vs a single-RHS apply) with mature pipeline overlap the
        hand-rolled scratch kernel could not match. The symbol exists so
        the matrix-form lockstep loop (``multi_cg_loop``), block CG, and
        the sharded WELL decomposition share one batched-apply API.
        """
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(X)

    def diagonal(self) -> jax.Array:
        # Built host-side at from_well time: the device scatter-add this
        # would need is not TPU-compilable (see matvec).
        return self.dvec

    def diagonal_blocks(self, bs: int) -> jax.Array:
        if self.dblk is None:
            raise NotImplementedError(
                "block Jacobi on a WellOperator needs the diagonal blocks "
                "extracted from the source CSR at construction: use "
                "WellOperator.from_csr(csr, pc_block_size=bs) (or "
                "best_sparse_operator(csr, pc_block_size=bs))"
            )
        if self.dblk.shape[1] != bs:
            raise ValueError(
                f"this WellOperator was built with pc_block_size="
                f"{self.dblk.shape[1]}, solve requested {bs}"
            )
        return self.dblk


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

    def diagonal_blocks(self, bs: int) -> jax.Array:
        # Stencil offsets are +-1 (x, broken at each x-line end), +-m (y,
        # broken at slab ends), +-m^2 (z); build their DIA rows with the
        # grid-boundary masks and assemble like any banded operator.
        m, N = self.m, self.n
        i = jnp.arange(N)
        offsets, rows = [0], [jnp.full(N, 6.0, jnp.float32)]
        for off, ok_fwd in (
            (1, (i % m) != m - 1),
            (m, ((i // m) % m) != m - 1),
            (m * m, (i // (m * m)) != m - 1),
        ):
            if off >= bs:
                continue  # never lands inside a bs-block
            fwd = jnp.where(ok_fwd & (i + off < N), -1.0, 0.0)
            bwd = jnp.where(
                (i >= off) & jnp.roll(ok_fwd, off), -1.0, 0.0
            )
            offsets += [off, -off]
            rows += [fwd.astype(jnp.float32), bwd.astype(jnp.float32)]
        return _blocks_from_diag_data(offsets, jnp.stack(rows), bs)


def best_sparse_operator(
    csr: CSRMatrix,
    backend: str = "auto",
    max_diags: int = 64,
    dia_fill_cap: float = 4.0,
    blocksize: int = 8,
    bsr_fill_cap: float = 3.0,
    fallback: str = "well",
    pc_block_size=None,
) -> LinearOperator:
    """Auto-promote a CSR matrix to the most TPU-honest device format.

    Scalar-gather ELL is the WORST TPU sparse path (~240x slower than
    shift-and-add for banded structure — gather is the wrong primitive,
    CLAUDE.md); this picks, in order:

    1. **DIA** when the matrix is banded: at most ``max_diags`` distinct
       diagonals and dense storage (ndiag * n) within ``dia_fill_cap`` x nnz.
       Gather-free fused Pallas shift-and-add.
    2. **BSR** when re-blocking into (blocksize x blocksize) dense tiles
       inflates stored entries by at most ``bsr_fill_cap``: each gather then
       moves bs elements per index and the tile products are dense VPU work.
       (n is identity-padded to the blocksize if needed.)
    3. **WELL** otherwise (square matrices) — windowed gather-ELL, the
       genuinely-irregular path built from row-DMA + lane-gather
       (``kernels.gather_spmv``); ``fallback="ell"`` restores the scalar
       ELL for comparison (its ~0.1 Gnnz/s cost is documented in RESULTS.md).
    """
    from tpucg.sparse.formats import csr_to_bsr, csr_to_dia

    n = csr.shape[0]
    nnz = max(csr.nnz, 1)
    offs = np.unique(csr.indices.astype(np.int64) - csr.to_coo().row)
    if offs.size <= max_diags and offs.size * n <= dia_fill_cap * nnz:
        return DiaOperator.from_dia(
            csr_to_dia(csr, max_diags=max_diags), backend=backend
        )
    bs = blocksize
    csr_b = csr
    if n % bs:
        npad = round_up(n, bs)
        # Identity-pad the CSR skeleton (same invariant as the partitioner).
        pad_rows = np.arange(n, npad)
        indptr = np.concatenate([
            csr.indptr,
            csr.indptr[-1] + np.arange(1, npad - n + 1),
        ])
        indices = np.concatenate([csr.indices, pad_rows.astype(np.int32)])
        data = np.concatenate([
            csr.data, np.ones(npad - n, dtype=csr.data.dtype)
        ])
        csr_b = CSRMatrix(
            indptr=indptr, indices=indices, data=data, shape=(npad, npad)
        )
    brow = csr_b.to_coo().row // bs
    bcol = csr_b.indices.astype(np.int64) // bs
    nnzb = np.unique(brow * (csr_b.shape[1] // bs) + bcol).size
    if nnzb * bs * bs <= bsr_fill_cap * nnz:
        op = BsrOperator.from_bsr(csr_to_bsr(csr_b, bs))
        if csr_b.shape[0] != n:
            # Report the logical size; solvers pad b/x via padded_n.
            op = BsrOperator(
                values=op.values, indices=op.indices, n=n
            )
        return op
    if fallback == "well" and n == csr.shape[1]:
        # pc_block_size: see WellOperator.from_csr — pre-extracts the
        # diagonal blocks so precondition='block_jacobi' is available
        # (DIA/BSR/dense extract theirs from addressable storage).
        return WellOperator.from_csr(csr, backend=backend,
                                     pc_block_size=pc_block_size)
    return EllOperator.from_csr(csr)


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
    from tpucg.sparse.well import WellMatrix

    if isinstance(A, WellMatrix):
        return WellOperator.from_well(A)
    if isinstance(A, DIAMatrix):
        # "auto" picks the fused Pallas kernel whenever supported and falls
        # back to the XLA shift-and-add otherwise (the ``backend`` argument
        # here keeps its dense-GEMV meaning).
        return DiaOperator.from_dia(A)
    arr = np.asarray(A) if not isinstance(A, jax.Array) else A
    if arr.ndim == 2:
        return DenseOperator.create(arr, backend=backend, dtype=dtype)
    raise TypeError(f"cannot interpret {type(A)!r} as a linear operator")
