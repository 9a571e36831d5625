"""ctypes loader for the native host kernels (qpn_tpu/native/qpn_host.cpp).

Builds the shared library with g++ on first use (cached in ~/.cache), and
falls back to pure-Python implementations when no compiler is available —
behavior is identical either way (tests assert it)."""

from __future__ import annotations

import ctypes
import hashlib
import itertools
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "native", "qpn_host.cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path()
    if not os.path.exists(src):
        return None
    tag = hashlib.sha1(open(src, "rb").read()).hexdigest()[:12]
    cache = os.path.join(os.path.expanduser("~/.cache/qpn_tpu_native"))
    so = os.path.join(cache, f"libqpn_host_{tag}.so")
    if not os.path.exists(so):
        try:
            os.makedirs(cache, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so + ".tmp"],
                check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.qpn_recipe_product.restype = ctypes.c_int64
        lib.qpn_recipe_product.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.qpn_quantize_hash.restype = None
        lib.qpn_quantize_hash.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint64)]
        lib.qpn_dedupe_rows.restype = None
        lib.qpn_dedupe_rows.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def recipe_product(label_sets: Sequence[Sequence[int]], cap: int) -> np.ndarray:
    """Cartesian product of per-row label choices as an (N, n_rows) int32
    array, truncated at ``cap`` (all_Ks, avi_solutions.jl:200-215)."""
    n_rows = len(label_sets)
    lists = [sorted(s) for s in label_sets]
    lib = _load()
    if lib is None or n_rows == 0:
        out = list(itertools.islice(itertools.product(*lists), cap))
        return np.asarray(out, dtype=np.int32).reshape(len(out), n_rows)
    flat = np.asarray([x for s in lists for x in s], dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum([len(s) for s in lists], out=offsets[1:])
    out = np.empty((cap, n_rows), dtype=np.int32)
    count = lib.qpn_recipe_product(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_rows, cap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out[:count].copy()


def quantize_hash(data: np.ndarray, digits: int = 5) -> np.ndarray:
    """Per-row FNV hash of 5-digit-rounded values (dedup currency)."""
    data = np.ascontiguousarray(data, dtype=np.float64)
    rows, cols = data.shape
    lib = _load()
    if lib is None:
        out = np.empty(rows, dtype=np.uint64)
        for r in range(rows):
            key = tuple(np.round(data[r], digits) + 0.0)
            out[r] = np.uint64(hash(key) & 0xFFFFFFFFFFFFFFFF)
        return out
    out = np.empty(rows, dtype=np.uint64)
    lib.qpn_quantize_hash(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), rows, cols,
        digits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def dedupe_rows_mask(data: np.ndarray, digits: int = 5) -> np.ndarray:
    """keep[r] = True iff row r is the first occurrence of its quantized
    content (Set-of-Slice semantics, sets.jl:104-112)."""
    data = np.ascontiguousarray(data, dtype=np.float64)
    rows, cols = data.shape
    lib = _load()
    if lib is None or rows == 0:
        seen = {}
        keep = np.zeros(rows, dtype=bool)
        for r in range(rows):
            key = tuple(np.round(data[r], digits) + 0.0)
            if key not in seen:
                seen[key] = r
                keep[r] = True
        return keep
    out = np.empty(rows, dtype=np.uint8)
    lib.qpn_dedupe_rows(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), rows, cols,
        digits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)
