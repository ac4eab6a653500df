"""ctypes bindings for the C++ ingest runtime (native/ingest.cpp).

Builds the shared library lazily with g++ (cached next to the source),
and falls back to pandas/numpy transparently when a toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "ingest.cpp")
_SO = os.path.join(_NATIVE_DIR, "libpmf_ingest.so")
_HASH = _SO + ".srchash"

_lib = None
_lock = threading.Lock()


def _src_hash() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True,
        )
        with open(_HASH, "w") as f:
            f.write(_src_hash())
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False


def _stale() -> bool:
    """The cached .so is usable only if a sidecar hash of the source it was
    built from matches (mtimes are not preserved by git checkouts, and a
    -march=native binary from another machine could SIGILL)."""
    if not os.path.exists(_SO) or not os.path.exists(_HASH):
        return True
    try:
        with open(_HASH) as f:
            return f.read().strip() != _src_hash()
    except OSError:
        return True


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _stale():
            if not os.path.exists(_SRC) or not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.pmf_parse_csv.restype = ctypes.c_int64
        lib.pmf_parse_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.pmf_free.restype = None
        lib.pmf_free.argtypes = [ctypes.c_void_p]
        lib.pmf_radix_argsort.restype = None
        lib.pmf_radix_argsort.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pmf_scatter_edges.restype = None
        lib.pmf_scatter_edges.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def scatter_edges(s, o, x, order, tile_starts, chunk_base, slot_of_chunk,
                  bs_self: int, bs_other: int, C: int, pad_packed: int,
                  total_slots: int):
    """Fused permute+pack+scatter of edges into the final blocked layout
    (`native/ingest.cpp:pmf_scatter_edges`); returns (packed, f_x) or None
    when the native library is unavailable or the payload dtype is not
    f32/f64 (callers keep the numpy path as fallback)."""
    lib = get_lib()
    if lib is None or x.dtype not in (np.float32, np.float64):
        return None
    s32 = np.ascontiguousarray(s, dtype=np.int32)
    o32 = np.ascontiguousarray(o, dtype=np.int32)
    xc = np.ascontiguousarray(x)
    order = np.ascontiguousarray(order, dtype=np.int64)
    tile_starts = np.ascontiguousarray(tile_starts, dtype=np.int64)
    chunk_base = np.ascontiguousarray(chunk_base, dtype=np.int64)
    slot_of_chunk = np.ascontiguousarray(slot_of_chunk, dtype=np.int64)
    packed = np.empty(total_slots, dtype=np.int32)
    f_x = np.empty(total_slots, dtype=np.float32)
    p64 = ctypes.POINTER(ctypes.c_double)
    p32f = ctypes.POINTER(ctypes.c_float)
    lib.pmf_scatter_edges(
        s32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        o32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xc.ctypes.data_as(p64) if xc.dtype == np.float64 else None,
        xc.ctypes.data_as(p32f) if xc.dtype == np.float32 else None,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(s32),
        tile_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(tile_starts),
        chunk_base.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        slot_of_chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(bs_self), int(bs_other), int(C),
        int(pad_packed), int(total_slots),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        f_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return packed, f_x


def parse_interactions_csv(path: str, columns=("u", "i", "rating"), n_threads: int = 0):
    """Parse a u/i/rating CSV into numpy arrays via the native parser;
    pandas fallback when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        import pandas as pd

        df = pd.read_csv(path)
        return (
            df[columns[0]].to_numpy(np.int64),
            df[columns[1]].to_numpy(np.int64),
            df[columns[2]].to_numpy(np.float64),
        )
    # Column indices from the header.
    with open(path) as f:
        header = f.readline().strip().split(",")
    idx = [header.index(c) for c in columns]

    up = ctypes.POINTER(ctypes.c_int32)()
    ip = ctypes.POINTER(ctypes.c_int32)()
    xp = ctypes.POINTER(ctypes.c_float)()
    n = lib.pmf_parse_csv(path.encode(), idx[0], idx[1], idx[2], n_threads,
                          ctypes.byref(up), ctypes.byref(ip), ctypes.byref(xp))
    if n < 0:
        raise IOError(f"native parse failed for {path}")
    try:
        u = np.ctypeslib.as_array(up, shape=(n,)).astype(np.int64)
        i = np.ctypeslib.as_array(ip, shape=(n,)).astype(np.int64)
        x = np.ctypeslib.as_array(xp, shape=(n,)).astype(np.float64)
    finally:
        lib.pmf_free(up)
        lib.pmf_free(ip)
        lib.pmf_free(xp)
    return u, i, x


def radix_argsort(keys: np.ndarray, n_keys: int, return_counts: bool = True):
    """Stable argsort of non-negative int32 keys (+ per-key counts) via the
    native radix sort; numpy fallback.  With ``return_counts=False`` the
    counts buffer is skipped (useful for huge key spaces)."""
    keys32 = np.ascontiguousarray(keys, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        perm = np.argsort(keys32, kind="stable")
        if not return_counts:
            return perm, None
        return perm, np.bincount(keys32, minlength=n_keys).astype(np.int64)
    n = len(keys32)
    perm = np.empty(n, dtype=np.int64)
    counts = np.zeros(n_keys, dtype=np.int64) if return_counts else None
    lib.pmf_radix_argsort(
        keys32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, n_keys,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if return_counts else None,
    )
    return perm, counts
