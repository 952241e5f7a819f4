"""ctypes bindings for the native C++ CSV loader (builds on demand).

The shared library is compiled from ``native/csv_loader.cpp`` with g++ the
first time it's needed and cached next to the source.  Falls back to a
pure-numpy parser when no compiler is available, so the framework works
everywhere; the native path is ~20-40x faster on the reference's
32 x ~3250-float trial CSVs.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "csv_loader.cpp"
_LIB = _NATIVE_DIR / "libcsvloader.so"
_lib_handle: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    if _lib_handle is not None:
        return _lib_handle
    if _build_failed:
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(str(_LIB))
    lib.csv_load_f32.restype = ctypes.c_int
    lib.csv_load_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.csv_load_batch_f32.restype = ctypes.c_int64
    lib.csv_load_batch_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib_handle = lib
    return lib


def native_available() -> bool:
    return _get_lib() is not None


def _numpy_fallback(path: str, max_rows: int, max_cols: int) -> Tuple[np.ndarray, int, int]:
    out = np.zeros((max_rows, max_cols), np.float32)
    rows = 0
    cols = 0
    with open(path) as f:
        for line in f:
            if rows >= max_rows:
                break
            vals = []
            for tok in line.strip().split(","):
                tok = tok.strip()
                if not tok:
                    continue
                try:
                    vals.append(float(tok))
                except ValueError:
                    vals.append(0.0)
            if not vals:
                continue
            n = min(len(vals), max_cols)
            out[rows, :n] = vals[:n]
            if rows == 0:
                cols = n
            rows += 1
    return out, rows, cols


def load_csv_f32(path: str | Path, max_rows: int = 64,
                 max_cols: int = 8192) -> Tuple[np.ndarray, int, int]:
    """Parse a numeric CSV into a zero-padded (max_rows, max_cols) f32 array.

    Returns (array, n_rows, n_cols_of_first_row).
    """
    lib = _get_lib()
    if lib is None:
        return _numpy_fallback(str(path), max_rows, max_cols)
    out = np.zeros((max_rows, max_cols), np.float32)
    r = ctypes.c_int64()
    c = ctypes.c_int64()
    rc = lib.csv_load_f32(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, max_cols, ctypes.byref(r), ctypes.byref(c),
    )
    if rc != 0:
        raise IOError(f"csv_load_f32 failed ({rc}) for {path}")
    return out, r.value, c.value


def load_csv_batch_f32(paths: List[str | Path], max_rows: int = 64,
                       max_cols: int = 8192):
    """Parse many CSVs into a contiguous (n, max_rows, max_cols) block.

    Returns (array, rows (n,), cols (n,), ok (n,) bool).
    """
    lib = _get_lib()
    n = len(paths)
    if lib is None:
        out = np.zeros((n, max_rows, max_cols), np.float32)
        rows = np.zeros(n, np.int64)
        cols = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, p in enumerate(paths):
            try:
                out[i], rows[i], cols[i] = _numpy_fallback(str(p), max_rows, max_cols)
                ok[i] = True
            except OSError:
                pass
        return out, rows, cols, ok
    out = np.zeros((n, max_rows, max_cols), np.float32)
    rows = np.zeros(n, np.int64)
    cols = np.zeros(n, np.int64)
    ok = np.zeros(n, np.uint8)
    buf = b"".join(str(p).encode() + b"\0" for p in paths)
    lib.csv_load_batch_f32(
        buf, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, max_cols,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, rows, cols, ok.astype(bool)
