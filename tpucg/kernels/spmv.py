"""Sparse matrix-vector products on TPU.

The device format is ELLPACK (``tpucg.sparse.formats.EllMatrix``): values and
column indices as dense (n, L) arrays. SpMV is then a gather of x by the index
matrix followed by an elementwise multiply and row-sum — fully static shapes,
which is what XLA's TPU tiler needs (CSR's ragged rows would force
data-dependent control flow). For stencil operators (Poisson) prefer the
matrix-free ``PoissonOperator``, which needs no gather at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ell_spmv(values: jax.Array, indices: jax.Array, x: jax.Array) -> jax.Array:
    """y[i] = sum_k values[i, k] * x[indices[i, k]].

    Padded entries carry value 0 (index 0), contributing nothing.
    """
    gathered = jnp.take(x, indices, axis=0)
    return jnp.sum(values * gathered, axis=1)


def dia_spmv(
    data: jax.Array, offsets: tuple, x: jax.Array
) -> jax.Array:
    """DIA SpMV: y[i] = sum_d data[d, i] * x[i + offsets[d]].

    ``offsets`` is a static tuple, so each diagonal lowers to a statically
    shifted (pad + slice) multiply-add — pure VPU streaming, no gather. This
    is the fast path for banded matrices on TPU (the scalar-gather ELL SpMV
    measures ~240x slower for the 7-point Poisson at n=64^3).
    """
    n = x.shape[0]
    y = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        if off == 0:
            y = y + data[d] * x
        elif off > 0:
            # column i+off: x shifted left by off, zero-padded at the tail.
            xs = jnp.concatenate([x[off:], jnp.zeros((off,), x.dtype)])
            y = y + data[d] * xs
        else:
            k = -off
            xs = jnp.concatenate([jnp.zeros((k,), x.dtype), x[:-k]])
            y = y + data[d] * xs
    return y


def bsr_ell_spmv(
    values: jax.Array, indices: jax.Array, x: jax.Array
) -> jax.Array:
    """Block-ELL SpMV: values (nbr, L, bs, bs), indices (nbr, L) block-column
    ids, x (nbr_cols * bs,). Each block row gathers L dense x-blocks and does
    a batched (bs x bs) matvec — the gather moves bs elements per index (vs 1
    for scalar ELL), and the block matvecs are dense contractions the TPU
    vector units run at full f32 precision (HIGHEST keeps XLA off the 1-pass
    bf16 MXU path, same contract as kernels.matvec).
    """
    nbr, L, bs, _ = values.shape
    xb = x.reshape(-1, bs)
    gathered = jnp.take(xb, indices.reshape(-1), axis=0).reshape(nbr, L, bs)
    return jnp.einsum(
        "rlij,rlj->ri",
        values,
        gathered,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(nbr * bs)
