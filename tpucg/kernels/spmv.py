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
