"""Reference text-format I/O.

The reference stores systems as one ASCII float per line, row-major, parsed with
``fscanf("%f%*c")`` (``serialConjugate.c:85-105``) — the ``%*c`` eats one separator
character, so stray bytes (e.g. the UTF-8 BOM inside ``initialguess1.txt``) are
tolerated. tpucg reproduces that tolerance but, unlike the reference (which prints
"Could not open file" and then *continues with uninitialized memory*,
``serialConjugate.c:101-104``), fails loudly on missing files and wrong counts.

For large systems, a C++ fast parser (``native/fastio.cpp``) is used when its
shared library is available; the NumPy path is the portable fallback.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

from tpucg.io import _native

# One float token: optional sign, digits, optional fraction/exponent — or
# inf/infinity/nan in any case (fscanf %f accepts those too; the native
# parser matches). Anything else on a line is separator noise (BOMs, CRs)
# and is skipped, matching %*c tolerance.
_FLOAT_RE = re.compile(
    rb"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
    rb"|(?i:[-+]?(?:inf(?:inity)?|nan))"
)


def _parse_floats(path: str, dtype: np.dtype) -> np.ndarray:
    """Parse every float token in ``path`` (reference one-value-per-line format)."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"input file {path!r} does not exist (the reference would continue "
            "with uninitialized memory here; tpucg fails loudly instead)"
        )
    if np.dtype(dtype) == np.float32:
        # The native parser emits float32; for wider dtypes (f64 extension)
        # fall through to the Python tokenizer so no precision is silently
        # lost to an f32 round-trip.
        arr = _native.parse_floats(path)
        if arr is not None:
            return arr
    with open(path, "rb") as f:
        data = f.read()
    tokens = _FLOAT_RE.findall(data)
    return np.array([float(t) for t in tokens], dtype=dtype)


def _is_npy(path: str) -> bool:
    return path.endswith(".npy")


def load_vector(path: str, n: Optional[int] = None, dtype=np.float32) -> np.ndarray:
    """Load a length-n vector from the reference text format, or from a
    binary ``.npy`` file (no parsing at all — the production format; convert
    with ``python -m tpucg convert``).

    If ``n`` is given, the file must contain exactly n values (the reference
    silently reads garbage on short files; we check).
    """
    if _is_npy(path):
        vals = np.load(path).reshape(-1).astype(dtype, copy=False)
        if n is not None and vals.size != n:
            raise ValueError(f"{path!r}: expected {n} values, found {vals.size}")
        return vals
    vals = _parse_floats(path, np.dtype(dtype))
    if n is not None and vals.size != n:
        raise ValueError(f"{path!r}: expected {n} values, found {vals.size}")
    return vals


def load_matrix(
    path: str,
    n: Optional[int] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Load a square row-major matrix from the reference text format.

    Without ``n``, the size is inferred: the file must hold a perfect-square
    number of values (the reference instead hard-codes ROWS/COLS at compile
    time, ``serialConjugate.c:29-30``). ``.npy`` files load binary, no
    parsing.
    """
    if _is_npy(path):
        vals = np.load(path).reshape(-1).astype(dtype, copy=False)
    else:
        vals = _parse_floats(path, np.dtype(dtype))
    if n is None:
        n = int(round(np.sqrt(vals.size)))
        if n * n != vals.size:
            raise ValueError(
                f"{path!r}: {vals.size} values is not a square matrix; pass n"
            )
    elif vals.size != n * n:
        raise ValueError(f"{path!r}: expected {n * n} values, found {vals.size}")
    return vals.reshape(n, n)


def load_matrix_rows(
    path: str,
    row_start: int,
    row_stop: int,
    n: int,
    dtype=np.float32,
) -> np.ndarray:
    """Load rows [row_start, row_stop) of an n x n reference-format matrix.

    Host-sharded loading: each shard parses only its own row block instead of
    one host materializing all of A (the reference's rank-0 ``initialize()``
    reads everything — its scalability ceiling, ``parallel_cg.c:100-108``;
    SURVEY.md §7 hard part (d)). Uses the native range parser when built; the
    portable fallback parses the whole file and slices.
    """
    if not 0 <= row_start <= row_stop <= n:
        raise ValueError(
            f"invalid row range [{row_start}, {row_stop}) for n={n}"
        )
    count = (row_stop - row_start) * n
    if count == 0:
        return np.empty((0, n), dtype)
    if _is_npy(path):
        # Memory-mapped: the OS pages in only the requested rows.
        mm = np.load(path, mmap_mode="r")
        if mm.size != n * n:
            raise ValueError(
                f"{path!r}: expected {n * n} values, found {mm.size}"
            )
        block = np.array(mm.reshape(n, n)[row_start:row_stop], dtype=dtype)
        del mm
        return block
    arr = (
        _native.parse_floats_range(path, row_start * n, count)
        if np.dtype(dtype) == np.float32  # native parser is f32-only
        else None
    )
    if arr is None:
        import warnings

        warnings.warn(
            "native range parser unavailable: load_matrix_rows is falling "
            "back to parsing the WHOLE matrix file and slicing — the "
            "host-sharded-loading memory guarantee does not hold on this "
            "host (build native/libfastio.so to restore it)",
            RuntimeWarning,
            stacklevel=2,
        )
        full = _parse_floats(path, np.dtype(dtype))
        if full.size != n * n:
            raise ValueError(
                f"{path!r}: expected {n * n} values, found {full.size}"
            )
        arr = full[row_start * n:row_stop * n]
    return arr.astype(dtype, copy=False).reshape(row_stop - row_start, n)


def save_array(path: str, arr: np.ndarray, fmt: str = "%.4f") -> None:
    """Write an array in the reference one-value-per-line row-major format.

    Mirrors ``generateSPDmatrix.m:23-43`` (which writes %.4f for A/b, %.1f for
    x0); pass ``fmt`` to control precision, or ``"%r"`` for round-trip exact.
    """
    flat = np.asarray(arr).reshape(-1)
    with open(path, "w") as f:
        if fmt == "%r":
            f.writelines(f"{repr(float(v))}\n" for v in flat)
        else:
            f.writelines((fmt % v) + "\n" for v in flat)


def load_system(
    matrix_path: str,
    rhs_path: str,
    x0_path: Optional[str] = None,
    n: Optional[int] = None,
    dtype=np.float32,
):
    """Load a full (A, b, x0) system, the reference's three positional args
    (``serialConjugate.c:65-67``). x0 defaults to zeros when no path is given."""
    A = load_matrix(matrix_path, n=n, dtype=dtype)
    n = A.shape[0]
    b = load_vector(rhs_path, n=n, dtype=dtype)
    if x0_path is None:
        x0 = np.zeros(n, dtype=dtype)
    else:
        x0 = load_vector(x0_path, n=n, dtype=dtype)
    return A, b, x0
