"""ctypes bridge to the optional C++ fast text parser (native/fastio.cpp).

The reference's data-distribution phase is dominated by rank 0 fscanf-ing the
whole matrix file (``parallel_cg.c:100-108``; 15.7 s at n=8192 for the p2p arm,
BASELINE.md). The native parser is tpucg's answer: a single-pass C++ tokenizer,
~20x faster than per-token Python parsing. If the shared library has not been
built, ``parse_floats`` returns None and callers fall back to NumPy parsing.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native")


def _lib_path() -> str:
    return os.path.join(_native_dir(), "libfastio.so")


def _try_build() -> bool:
    """Build libfastio.so from source with make/g++, once, best-effort.

    Opt out with TPUCG_NO_NATIVE_BUILD=1 (e.g. sandboxed environments).
    """
    if os.environ.get("TPUCG_NO_NATIVE_BUILD", "") == "1":
        return False
    src = os.path.join(_native_dir(), "fastio.cpp")
    if not os.path.exists(src):
        return False
    import subprocess

    try:
        proc = subprocess.run(
            ["make", "-C", _native_dir(), "libfastio.so"],
            capture_output=True,
            timeout=120,
        )
        return proc.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    # Always attempt the build: make's fastio.cpp dependency is a no-op when
    # the .so is fresh and transparently rebuilds a STALE one (a pre-range
    # library would otherwise be loaded forever and silently degrade
    # host-sharded loading to the slow path).
    _try_build()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fastio_count_floats.restype = ctypes.c_longlong
        lib.fastio_count_floats.argtypes = [ctypes.c_char_p]
        lib.fastio_parse_floats.restype = ctypes.c_longlong
        lib.fastio_parse_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        try:
            lib.fastio_parse_floats_range.restype = ctypes.c_longlong
            lib.fastio_parse_floats_range.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong,
            ]
        except AttributeError:  # stale pre-range .so on disk
            pass
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def parse_floats_range(
    path: str, start: int, count: int
) -> Optional[np.ndarray]:
    """Parse float tokens [start, start+count) of ``path``, or None if the
    native library (with range support) is unavailable. The host-sharded
    loading primitive: a shard reads only its rows."""
    lib = _load()
    if lib is None or not hasattr(lib, "fastio_parse_floats_range"):
        return None
    out = np.empty(count, dtype=np.float32)
    got = lib.fastio_parse_floats_range(
        os.fsencode(path),
        int(start),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(count),
    )
    if got < 0:
        raise IOError(f"native parser failed to open {path!r}")
    if got != count:
        raise ValueError(
            f"{path!r}: requested tokens [{start}, {start + count}), "
            f"file only yielded {got}"
        )
    return out


def parse_floats(path: str) -> Optional[np.ndarray]:
    """Parse all float tokens in ``path`` via the native library, or None.

    Allocates an upper-bound buffer (a token needs >= 2 bytes incl. its
    separator, so cap = size // 2 + 1) instead of paying a separate counting
    pass over the whole file — the parse call already tokenizes once for its
    per-chunk offsets, so this keeps the total at two passes, not three.
    """
    lib = _load()
    if lib is None:
        return None
    cpath = os.fsencode(path)
    try:
        size = os.path.getsize(path)
    except OSError:
        raise IOError(f"native parser failed to open {path!r}")
    cap = size // 2 + 1
    out = np.empty(cap, dtype=np.float32)
    got = lib.fastio_parse_floats(
        cpath, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap
    )
    if got < 0:
        raise IOError(f"native parser failed to open {path!r}")
    result = out[:got].copy()
    del out
    return result
