"""ctypes loader for the native C++ packing library (native/packlib.cpp).

Builds the shared library with g++ on first use (no pybind11 in this image —
plain C ABI + ctypes per environment constraints) and caches it next to the
source. Falls back silently to the vectorized-numpy implementations in
quant/packing.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "packlib.cpp")


def _build() -> str | None:
    """Build (or reuse) the shared library, cached by SOURCE HASH.

    mtime-based caching is wrong for git checkouts (checkout does not
    preserve mtimes, so a stale binary could shadow newer source), and a
    committed -march=native binary is host-specific; the library is never
    committed — each host builds its own, keyed on the source contents.
    """
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    ndir = os.path.dirname(_SRC)
    so = os.path.join(ndir, f"packlib-{digest}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-march=native",
             _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
    except Exception:
        try:
            os.unlink(tmp)  # don't leak partial outputs of failed builds
        except OSError:
            pass
        return None
    # prune caches of OTHER source revisions only: a concurrent builder's
    # in-flight tmp for the SAME digest must survive, or its os.replace
    # fails and that process silently falls back to the slow numpy path
    prefix = os.path.basename(so)  # packlib-<digest>.so
    for old in os.listdir(ndir):
        if (old.startswith("packlib-") and not old.startswith(prefix)
                and (old.endswith(".so") or ".so.tmp" in old)):
            try:
                os.unlink(os.path.join(ndir, old))
            except OSError:
                pass
    return so


def get_lib():
    """The loaded library or None (numpy fallback)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("GPTQ_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.pack_rows.argtypes = [u32p, u32p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int]
            lib.unpack_rows.argtypes = [u32p, u32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int]
            lib.quantize_to_codes.argtypes = [f32p, f32p, f32p, i32p, u32p,
                                              ctypes.c_int64, ctypes.c_int64,
                                              ctypes.c_int64]
            lib.gather_rows_packed.argtypes = [u32p, u32p, i32p,
                                               ctypes.c_int64, ctypes.c_int64,
                                               ctypes.c_int]
            lib.packlib_version.restype = ctypes.c_int
            assert lib.packlib_version() == 3
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def pack_rows(codes: np.ndarray, bits: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    k, n = codes.shape[0], int(np.prod(codes.shape[1:], dtype=np.int64))
    out = np.empty((k * bits // 32,) + codes.shape[1:], dtype=np.uint32)
    lib.pack_rows(codes.reshape(k, n), out.reshape(-1, n), k, n, bits)
    return out.view(np.int32)


def unpack_rows(packed: np.ndarray, bits: int, k: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed).view(np.uint32)
    n = int(np.prod(packed.shape[1:], dtype=np.int64))
    out = np.empty((k,) + packed.shape[1:], dtype=np.uint32)
    lib.unpack_rows(packed.reshape(-1, n), out.reshape(k, n), k, n, bits)
    return out.view(np.int32)


def gather_rows_packed(packed: np.ndarray, perm: np.ndarray,
                       bits: int) -> np.ndarray | None:
    """codes-row gather on packed words: out row r = in row perm[r]."""
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed).view(np.uint32)
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    k = perm.shape[0]
    n = int(np.prod(packed.shape[1:], dtype=np.int64))
    out = np.empty_like(packed)
    lib.gather_rows_packed(packed.reshape(-1, n), out.reshape(-1, n),
                           perm, k, n, bits)
    return out.view(np.int32)


def quantize_to_codes(w: np.ndarray, scales: np.ndarray, zeros: np.ndarray,
                      g_idx: np.ndarray) -> np.ndarray | None:
    """codes = rint(w/s + z) in double, half-to-even, no clamp — byte-exact
    with quant/packing.quantize_weight_to_codes (which calls this fast path
    when inputs are float32-exact)."""
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, dtype=np.float32)
    scales = np.ascontiguousarray(scales, dtype=np.float32)
    zeros = np.ascontiguousarray(zeros, dtype=np.float32)
    g_idx = np.ascontiguousarray(g_idx, dtype=np.int32)
    n_rows, k = w.shape
    out = np.empty((k, n_rows), dtype=np.uint32)
    lib.quantize_to_codes(w, scales, zeros, g_idx, out, n_rows, k,
                          scales.shape[1])
    return out.view(np.int32)
