"""Sparse matrix formats (host-side containers + TPU-friendly device forms)."""

from tpucg.sparse.formats import COOMatrix, CSRMatrix, EllMatrix, csr_to_ell

__all__ = ["COOMatrix", "CSRMatrix", "EllMatrix", "csr_to_ell"]
