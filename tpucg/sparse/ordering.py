"""Bandwidth/locality-reducing orderings for irregular sparse matrices.

TPU sparse kernels are window-based (WELL gathers 128-wide windows of x per
sublane row, DIA wants a narrow band): the fewer distinct 128-column windows
the rows of a 128-row group touch, the higher the packing fill and the less
gathered-window traffic. ``rcm_order`` is a vectorized level-set variant of
reverse Cuthill-McKee: BFS level sets from a minimum-degree seed, each level
sorted by degree, order reversed. Classic RCM refines ordering WITHIN levels
by parent order; the level-set variant keeps the same O(bandwidth) envelope
while staying pure vectorized NumPy (no per-vertex Python loop).
"""

from __future__ import annotations

import numpy as np

from tpucg.sparse.formats import COOMatrix, CSRMatrix


def permute_csr(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """Symmetric permutation P A P^T: row/col i of the result is row/col
    ``perm[i]`` of the input (``perm`` is the new-to-old order, as returned
    by ``rcm_order``)."""
    n = csr.shape[0]
    if csr.shape[0] != csr.shape[1]:
        raise ValueError(f"symmetric permutation needs square, got {csr.shape}")
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n, dtype=np.int64)
    coo = csr.to_coo()
    return COOMatrix(
        row=inv[coo.row],
        col=inv[coo.col.astype(np.int64)],
        data=coo.data,
        shape=csr.shape,
    ).to_csr()


def _neighbors_of(indptr, indices, frontier):
    """All column indices of the given rows, concatenated (vectorized)."""
    counts = indptr[frontier + 1] - indptr[frontier]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=indices.dtype)
    starts = np.repeat(indptr[frontier], counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return indices[starts + within]


def rcm_order(csr: CSRMatrix) -> np.ndarray:
    """Reverse Cuthill-McKee (level-set variant): new-to-old permutation.

    Handles disconnected graphs (each component seeded at its minimum-degree
    unvisited vertex). Use with ``permute_csr`` before ``csr_to_well`` /
    ``csr_to_dia`` when the input ordering has no locality (e.g. arbitrary
    .mtx files); measured effect is reported in RESULTS.md.
    """
    n = csr.shape[0]
    indptr = csr.indptr.astype(np.int64)
    indices = csr.indices.astype(np.int64)
    deg = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    out = np.empty(n, dtype=np.int64)
    pos = 0
    # Seeds in globally increasing degree order; skip already-visited ones.
    seed_order = np.argsort(deg, kind="stable")
    seed_ptr = 0
    while pos < n:
        while seed_ptr < n and visited[seed_order[seed_ptr]]:
            seed_ptr += 1
        frontier = np.asarray([seed_order[seed_ptr]], dtype=np.int64)
        visited[frontier] = True
        while frontier.size:
            frontier = frontier[np.argsort(deg[frontier], kind="stable")]
            out[pos: pos + frontier.size] = frontier
            pos += frontier.size
            nbrs = _neighbors_of(indptr, indices, frontier)
            nbrs = nbrs[~visited[nbrs]]
            frontier = np.unique(nbrs)
            visited[frontier] = True
    return out[::-1].copy()
