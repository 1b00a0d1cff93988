"""MatrixMarket (.mtx) I/O — the standard sparse interchange format.

The reference reads only its own one-float-per-line dense text format
(``serialConjugate.c:85-105``); real sparse SPD systems (SuiteSparse, NIST)
ship as MatrixMarket files. This loader covers the formats a CG library
meets in practice:

- ``coordinate`` ``real | integer | pattern``, ``general | symmetric``
  (symmetric files store the lower triangle only; off-diagonal entries are
  mirrored on load so the in-memory matrix is the full operator);
- ``array`` (dense column-major) ``real | integer``, ``general | symmetric``.

``complex``/``hermitian``/``skew-symmetric`` qualifiers are rejected loudly —
CG requires a real SPD operator, and silently dropping imaginary parts or
signs would corrupt the system.

Parsing is vectorized NumPy (one whitespace split + bulk float conversion
over the comment-stripped body), not a per-token loop: a 1M-nnz file loads
in tens of ms.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

from tpucg.sparse.formats import COOMatrix, CSRMatrix

_BANNER = "%%MatrixMarket"
_FORMATS = ("coordinate", "array")
_FIELDS = ("real", "integer", "pattern")
_SYMMETRIES = ("general", "symmetric")


def _parse_header(path: str, first: str) -> tuple:
    toks = first.strip().split()
    if len(toks) != 5 or toks[0].lower() != _BANNER.lower():
        raise ValueError(
            f"{path!r}: not a MatrixMarket file (header {first.strip()!r}; "
            f"expected '%%MatrixMarket matrix <format> <field> <symmetry>')"
        )
    obj, fmt, field, sym = (t.lower() for t in toks[1:])
    if obj != "matrix":
        raise ValueError(f"{path!r}: unsupported object {obj!r}")
    if fmt not in _FORMATS:
        raise ValueError(f"{path!r}: unsupported format {fmt!r}")
    if field not in _FIELDS:
        raise ValueError(
            f"{path!r}: unsupported field {field!r} — CG needs a real "
            "operator (complex/hermitian files are out of scope)"
        )
    if sym not in _SYMMETRIES:
        raise ValueError(
            f"{path!r}: unsupported symmetry {sym!r} — only general/"
            "symmetric (skew-symmetric cannot be SPD)"
        )
    if fmt == "array" and field == "pattern":
        raise ValueError(f"{path!r}: array format cannot be pattern")
    return fmt, field, sym


def _body_lines(path: str) -> tuple:
    """(header_line, size_line, joined_data_body) with comments stripped."""
    with open(path, "rb") as f:
        raw = f.read()
    lines = raw.decode("ascii", errors="replace").splitlines()
    if not lines:
        raise ValueError(f"{path!r}: empty file")
    header, rest = lines[0], lines[1:]
    body = [ln for ln in rest if ln.strip() and not ln.lstrip().startswith("%")]
    if not body:
        raise ValueError(f"{path!r}: missing size line")
    return header, body[0], "\n".join(body[1:])


def _parse_floats(path: str, data: str) -> np.ndarray:
    """Bulk-parse whitespace-separated floats; Fortran 'D' exponents OK."""
    toks = data.split()
    try:
        return np.array(toks, dtype=np.float64)
    except ValueError:
        # Retry with Fortran double-precision exponents (1.5D+03), then
        # point at the offending token.
        try:
            return np.array([t.replace("D", "E").replace("d", "e")
                             for t in toks], dtype=np.float64)
        except ValueError:
            for t in toks:
                try:
                    float(t.replace("D", "E").replace("d", "e"))
                except ValueError:
                    raise ValueError(
                        f"{path!r}: unparsable numeric token {t!r}"
                    ) from None
            raise


def load_matrix_market(
    path: str, dtype=np.float32
) -> Union[COOMatrix, np.ndarray]:
    """Load a MatrixMarket file.

    Returns a host-side ``COOMatrix`` for ``coordinate`` files (chain
    ``.to_csr()`` / ``tpucg.best_sparse_operator`` for a device operator) and
    a dense ``np.ndarray`` for ``array`` files. Symmetric storage is expanded
    to the full matrix in both cases.
    """
    header, size_line, data = _body_lines(path)
    fmt, field, sym = _parse_header(path, header)
    dims = size_line.split()

    if fmt == "array":
        if len(dims) != 2:
            raise ValueError(f"{path!r}: array size line {size_line!r}")
        nrow, ncol = int(dims[0]), int(dims[1])
        # split() tolerates any whitespace layout (the spec says one value
        # per line; files in the wild sometimes wrap) and raises a clear
        # ValueError on the first unparsable token.
        vals = _parse_floats(path, data)
        if sym == "symmetric":
            if nrow != ncol:
                raise ValueError(f"{path!r}: symmetric but {nrow}x{ncol}")
            want = nrow * (nrow + 1) // 2
            if vals.size != want:
                raise ValueError(
                    f"{path!r}: symmetric array needs {want} values "
                    f"(lower triangle, column-major), found {vals.size}"
                )
            A = np.zeros((nrow, ncol), dtype=np.float64)
            il, jl = np.tril_indices(nrow)
            # MM array data is column-major: sort (col, row).
            order = np.lexsort((il, jl))
            A[il[order], jl[order]] = vals
            A = A + A.T - np.diag(np.diag(A))
        else:
            if vals.size != nrow * ncol:
                raise ValueError(
                    f"{path!r}: expected {nrow * ncol} values, "
                    f"found {vals.size}"
                )
            A = vals.reshape((ncol, nrow)).T  # column-major on disk
        return np.ascontiguousarray(A.astype(dtype))

    # coordinate
    if len(dims) != 3:
        raise ValueError(f"{path!r}: coordinate size line {size_line!r}")
    nrow, ncol, nnz = int(dims[0]), int(dims[1]), int(dims[2])
    per_line = 2 if field == "pattern" else 3
    toks = _parse_floats(path, data)
    if toks.size != nnz * per_line:
        raise ValueError(
            f"{path!r}: expected {nnz} entries x {per_line} tokens = "
            f"{nnz * per_line}, found {toks.size}"
        )
    toks = toks.reshape((nnz, per_line))
    row = toks[:, 0].astype(np.int64) - 1  # 1-based on disk
    col = toks[:, 1].astype(np.int64) - 1
    if nnz and (
        row.min() < 0 or col.min() < 0
        or row.max() >= nrow or col.max() >= ncol
    ):
        raise ValueError(f"{path!r}: index out of range for {nrow}x{ncol}")
    val = (
        np.ones(nnz, dtype=np.float64) if field == "pattern" else toks[:, 2]
    )
    if sym == "symmetric":
        if nrow != ncol:
            raise ValueError(f"{path!r}: symmetric but {nrow}x{ncol}")
        off = row != col
        row = np.concatenate([row, col[off]])
        col = np.concatenate([col, toks[:, 0].astype(np.int64)[off] - 1])
        val = np.concatenate([val, val[off]])
    return COOMatrix(row=row, col=col, data=val.astype(dtype),
                     shape=(nrow, ncol))


def save_matrix_market(
    path: str,
    mat: Union[COOMatrix, CSRMatrix, np.ndarray],
    symmetric: bool = False,
    comment: str = "",
) -> None:
    """Write ``mat`` as MatrixMarket coordinate (sparse) or array (dense).

    ``symmetric=True`` stores only the lower triangle (the file declares
    ``symmetric``); the caller asserts the matrix IS symmetric — entries
    above the diagonal are dropped, not checked, matching the format's
    storage contract.
    """
    tmp = f"{path}.tmp.{os.getpid()}"
    if isinstance(mat, CSRMatrix):
        mat = mat.to_coo()
    with open(tmp, "w") as f:
        if isinstance(mat, COOMatrix):
            sym = "symmetric" if symmetric else "general"
            f.write(f"%%MatrixMarket matrix coordinate real {sym}\n")
            if comment:
                f.write(f"% {comment}\n")
            row, col, val = mat.row, mat.col, mat.data
            if symmetric:
                keep = row >= col
                row, col, val = row[keep], col[keep], val[keep]
            f.write(f"{mat.shape[0]} {mat.shape[1]} {row.size}\n")
            np.savetxt(
                f,
                np.column_stack([row + 1, col + 1, val]),
                fmt=("%d", "%d", "%.9g"),
            )
        else:
            A = np.asarray(mat)
            if A.ndim == 1:
                A = A[:, None]
            sym = "symmetric" if symmetric else "general"
            f.write(f"%%MatrixMarket matrix array real {sym}\n")
            if comment:
                f.write(f"% {comment}\n")
            f.write(f"{A.shape[0]} {A.shape[1]}\n")
            if symmetric:
                il, jl = np.tril_indices(A.shape[0])
                order = np.lexsort((il, jl))  # column-major
                np.savetxt(f, A[il[order], jl[order]], fmt="%.9g")
            else:
                np.savetxt(f, A.T.reshape(-1), fmt="%.9g")  # column-major
    os.replace(tmp, path)
