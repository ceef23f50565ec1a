"""ctypes bindings for the native host kernels (cpp/host_kernels.cpp).

The reference keeps its setup-phase graph work in native code (KaMinPar
partitioning — GraphPartition.cpp, GPU BSR packing — BSRMatrix.cu, vendor AMD
orderings inside CHOLMOD/Pardiso). This module is our equivalent: RCM
ordering, greedy aggregation, ELL packing, halo-map computation — all C++,
loaded via ctypes (pybind11 is not in the image).

If the shared library is missing it is built on first use (g++ is baked in);
if that fails, callers fall back to the scipy/numpy implementations — the
native path is a performance feature, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_native", "libhostkernels.so")
_SRC = os.path.join(os.path.dirname(_HERE), "cpp", "host_kernels.cpp")

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-std=c++17", _SRC, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.rcm_order.restype = ctypes.c_int
    lib.rcm_order.argtypes = [_i64p, _i32p, ctypes.c_int64, _i32p]
    lib.greedy_aggregate.restype = ctypes.c_int64
    lib.greedy_aggregate.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                                     ctypes.c_double, _f64p, _i64p]
    lib.csr_to_ell.restype = ctypes.c_int64
    lib.csr_to_ell.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                               ctypes.c_int64, _i32p, _f64p]
    lib.partition_halos.restype = ctypes.c_int
    lib.partition_halos.argtypes = [_i64p, _i32p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64, _i64p, _i64p]
    lib.csr_bandwidth.restype = ctypes.c_int64
    lib.csr_bandwidth.argtypes = [_i64p, _i32p, ctypes.c_int64]
    lib.md_order.restype = ctypes.c_int
    lib.md_order.argtypes = [_i64p, _i32p, ctypes.c_int64, _i32p]
    lib.kway_partition.restype = ctypes.c_int64
    lib.kway_partition.argtypes = [_i64p, _i32p, _i64p, ctypes.c_int64,
                                   ctypes.c_int64, _i32p]
    lib.spgemm.restype = ctypes.c_int64
    lib.spgemm.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                           _i64p, _i32p, _f64p, ctypes.c_int64, _i64p]
    lib.spgemm_axpby.restype = ctypes.c_int64
    lib.spgemm_axpby.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                                 _i64p, _i32p, _f64p, ctypes.c_int64,
                                 ctypes.c_double, _i64p, _i32p, _f64p,
                                 ctypes.c_double, _i64p]
    lib.spgemm_fetch.restype = ctypes.c_int
    lib.spgemm_fetch.argtypes = [_i32p, _f64p]
    lib.csr_transpose.restype = ctypes.c_int
    lib.csr_transpose.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                                  ctypes.c_int64, _i64p, _i32p, _f64p]
    lib.dia_analyze.restype = ctypes.c_int64
    lib.dia_analyze.argtypes = [_i64p, _i32p, ctypes.c_int64, ctypes.c_int64,
                                _i64p]
    lib.csr_to_dia.restype = ctypes.c_int
    lib.csr_to_dia.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64, _i64p,
                               ctypes.c_int64, _f64p]
    if hasattr(lib, "tile_ell_plan"):
        lib.tile_ell_plan.restype = ctypes.c_int64
        lib.tile_ell_plan.argtypes = [_i64p, _i32p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64]
        lib.tile_ell_fetch.restype = ctypes.c_int
        lib.tile_ell_fetch.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                                       _f64p, _i8p, _i8p, _i32p, _i32p]
    if hasattr(lib, "tile_ell_plan2"):
        lib.tile_ell_plan2.restype = ctypes.c_int64
        lib.tile_ell_plan2.argtypes = [_i64p, _i32p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64]
        lib.tile_ell_fetch2.restype = ctypes.c_int
        lib.tile_ell_fetch2.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                                        _f64p, _i8p, _i8p, _i8p, _i8p,
                                        _i32p, _i32p]
    if hasattr(lib, "tile_ell_plan3"):
        lib.tile_ell_plan3.restype = ctypes.c_int64
        lib.tile_ell_plan3.argtypes = [_i64p, _i32p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64]
        lib.tile_ell_fetch3.restype = ctypes.c_int
        lib.tile_ell_fetch3.argtypes = [_i64p, _i32p, _f64p, ctypes.c_int64,
                                        _f64p, _i8p, _i8p, _i8p,
                                        _i32p, _i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _csr_arrays(A):
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int32)
    return indptr, indices


def rcm_order(A) -> Optional[np.ndarray]:
    """Native reverse Cuthill–McKee; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr, indices = _csr_arrays(A)
    n = A.shape[0]
    perm = np.empty(n, dtype=np.int32)
    if lib.rcm_order(indptr, indices, n, perm) != 0:
        return None
    return perm.astype(np.int64)


def greedy_aggregate(A, eps: float) -> Optional[Tuple[np.ndarray, int]]:
    """Native Vaněk greedy aggregation on |A| with strength threshold eps."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    indptr, indices = _csr_arrays(A)
    weights = np.ascontiguousarray(np.abs(A.data), dtype=np.float64)
    diag = np.ascontiguousarray(np.abs(A.diagonal()), dtype=np.float64)
    diag[diag == 0] = 1.0
    n = A.shape[0]
    agg = np.empty(n, dtype=np.int64)
    n_agg = lib.greedy_aggregate(indptr, indices, weights, n, float(eps),
                                 diag, agg)
    if n_agg <= 0:
        return None
    return agg, int(n_agg)


def csr_to_ell(A, width: int) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Native CSR→ELL packing: returns (cols (n,w) int32, vals (n,w) f64, maxdeg)."""
    lib = get_lib()
    if lib is None:
        return None
    indptr, indices = _csr_arrays(A)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    n = A.shape[0]
    cols = np.empty((n, width), dtype=np.int32)
    vals = np.empty((n, width), dtype=np.float64)
    maxdeg = lib.csr_to_ell(indptr, indices, data, n, width, cols, vals)
    if maxdeg < 0:
        return None
    return cols, vals, int(maxdeg)


def partition_halos(A, n_shards: int, rows_per: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    indptr, indices = _csr_arrays(A)
    lo = np.empty(n_shards, dtype=np.int64)
    hi = np.empty(n_shards, dtype=np.int64)
    lib.partition_halos(indptr, indices, A.shape[0], n_shards, rows_per, lo, hi)
    return lo, hi


def md_order(A) -> Optional[np.ndarray]:
    """Native minimum-degree fill-reducing ordering (quotient graph with
    element absorption — the role of AMD in the reference's direct backends).
    Returns the elimination order (perm[k] = node eliminated at step k), or
    None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr, indices = _csr_arrays(A)
    n = A.shape[0]
    perm = np.empty(n, dtype=np.int32)
    if lib.md_order(indptr, indices, n, perm) != 0:
        return None
    return perm.astype(np.int64)


def kway_partition(A, k: int, weights: Optional[np.ndarray] = None
                   ) -> Optional[np.ndarray]:
    """Multilevel K-way graph partition (heavy-edge-matching coarsening +
    recursive bisection + FM refinement — the reference's KaMinPar role,
    GraphPartition.cpp:176-289). ``A`` is the (symmetric) adjacency in CSR;
    ``weights`` int64 edge weights aligned with ``A.indices`` (default: |data|
    quantized). Returns part ids (n,) in [0, k), or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    indptr, indices = _csr_arrays(A)
    if weights is None:
        d = np.abs(A.data)
        scale = d.max() if d.size and d.max() > 0 else 1.0
        weights = np.maximum((d / scale * 1024).astype(np.int64), 1)
    weights = np.ascontiguousarray(weights, dtype=np.int64)
    n = A.shape[0]
    part = np.empty(n, dtype=np.int32)
    got = lib.kway_partition(indptr, indices, weights, n, int(k), part)
    if got <= 0:
        return None
    return part


def _csr_full(A):
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int32)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    return indptr, indices, data


_SPGEMM_LOCK = threading.Lock()


def spgemm(A, B, alpha: float = 1.0, S=None, beta: float = 1.0):
    """Native C = beta·S + alpha·A@B (Gustavson, row-parallel threads — the
    AMG setup's Galerkin/smoothing products; scipy's csr_matmat is
    single-threaded and two-pass). Returns scipy CSR or None if unavailable.
    ``S`` (optional) must be CSR with A's row count."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    ipA, jA, vA = _csr_full(A)
    ipB, jB, vB = _csr_full(B)
    m, ncolsB = A.shape[0], B.shape[1]
    ipC = np.empty(m + 1, dtype=np.int64)
    if S is None and alpha != 1.0:
        # the S-less C entry point hardcodes alpha=1 — fold alpha into A
        vA = vA * float(alpha)
    # compute and fetch stage through process-global buffers in the C library;
    # serialize the pair so concurrent Python threads can't interleave them
    with _SPGEMM_LOCK:
        if S is None:
            nnz = lib.spgemm(ipA, jA, vA, m, ipB, jB, vB, ncolsB, ipC)
        else:
            ipS, jS, vS = _csr_full(S)
            nnz = lib.spgemm_axpby(ipA, jA, vA, m, ipB, jB, vB, ncolsB,
                                   float(alpha), ipS, jS, vS, float(beta), ipC)
        if nnz < 0:
            return None
        jC = np.empty(nnz, dtype=np.int32)
        vC = np.empty(nnz, dtype=np.float64)
        lib.spgemm_fetch(jC, vC)
    C = sp.csr_matrix((vC, jC, ipC), shape=(m, ncolsB))
    C.has_sorted_indices = True  # spgemm_rows sorts each row
    return C


def csr_transpose(A):
    """Native Aᵀ as CSR (counting sort; scipy's .T.tocsr() at 1M+ rows was a
    visible slice of AMG setup). Returns scipy CSR or None."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    ip, j, v = _csr_full(A)
    m, ncols = A.shape
    ipT = np.empty(ncols + 1, dtype=np.int64)
    jT = np.empty(A.nnz, dtype=np.int32)
    vT = np.empty(A.nnz, dtype=np.float64)
    if lib.csr_transpose(ip, j, v, m, ncols, ipT, jT, vT) != 0:
        return None
    T = sp.csr_matrix((vT, jT, ipT), shape=(ncols, m))
    T.has_sorted_indices = True
    return T


def dia_analyze(A, cap: int):
    """Distinct diagonal offsets of square CSR ``A`` straight off the index
    arrays (no COO materialization). Returns int64 offsets array, -1 if the
    count exceeds ``cap`` (caller should fall back to ELL), or None if the
    native library is unavailable."""
    if A.shape[0] != A.shape[1]:
        # the C kernel sizes its diagonal LUT as 2n-1 from the row count; a
        # wider rectangular matrix would index out of bounds (ADVICE r1)
        return None
    lib = get_lib()
    if lib is None:
        return None
    indptr, indices = _csr_arrays(A)
    offs = np.empty(max(int(cap), 1), dtype=np.int64)
    k = lib.dia_analyze(indptr, indices, A.shape[0], int(cap), offs)
    if k < 0:
        return -1
    return offs[:k].copy()


def csr_to_dia(A, offs: np.ndarray) -> Optional[np.ndarray]:
    """Scatter CSR values into diag-major (K, n) float64 storage for the
    given offsets (from ``dia_analyze``). Returns the array or None."""
    if A.shape[0] != A.shape[1]:
        return None
    lib = get_lib()
    if lib is None:
        return None
    ip, j, v = _csr_full(A)
    n = A.shape[0]
    offs = np.ascontiguousarray(offs, dtype=np.int64)
    vals = np.zeros((len(offs), n), dtype=np.float64)
    if lib.csr_to_dia(ip, j, v, n, offs, len(offs), vals) != 0:
        return None
    return vals


def csr_bandwidth(A) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    indptr, indices = _csr_arrays(A)
    return int(lib.csr_bandwidth(indptr, indices, A.shape[0]))


_TILE_ELL_LOCK = threading.Lock()


def tile_ell_pack(A, cr: int = 32, span_cap: int = 120):
    """Composite tile-ELL packing (ops/tile_ell.py) — native first-fit.
    Returns (vals, r8, q8, wb, tile_of) or None (numpy fallback packs).
    plan+fetch stage through process-global state → serialized by a lock
    (the spgemm staging-hazard lesson, ADVICE r1)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tile_ell_plan"):
        return None
    indptr, indices = _csr_arrays(A)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    n = A.shape[0]
    with _TILE_ELL_LOCK:
        TC = lib.tile_ell_plan(indptr, indices, n, cr, span_cap)
        if TC <= 0:
            return None
        vals = np.zeros((TC, cr, 128), np.float64)
        r8 = np.zeros((TC, cr, 128), np.int8)
        q8 = np.zeros((TC, cr, 128), np.int8)
        wb = np.zeros(TC, np.int32)
        tile_of = np.zeros(TC, np.int32)
        if lib.tile_ell_fetch(indptr, indices, data, n, vals, r8, q8, wb,
                              tile_of) != 0:
            return None
    return vals, r8, q8, wb, tile_of


def tile_ell_pack2(A, cr: int = 128, st: int = 16, span_cap: int = 120,
                   nqm: int = 2):
    """Supertile composite tile-ELL packing (ops/tile_ell.py v2) — native
    first-fit with per-(dest-tile, lane) cursors and ``nqm`` segment maps
    per slot-row (2 halves the slot inflation from source-lane conflicts).
    Returns (vals, r8, q8, q8b, oh8, wb, super_of) or None; r8 bit 7 selects
    the segment map. Serialized (global staging)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tile_ell_plan2"):
        return None
    indptr, indices = _csr_arrays(A)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    n = A.shape[0]
    with _TILE_ELL_LOCK:
        TC = lib.tile_ell_plan2(indptr, indices, n, cr, st, span_cap, nqm)
        if TC <= 0:
            return None
        vals = np.zeros((TC, cr, 128), np.float64)
        r8 = np.zeros((TC, cr, 128), np.int8)
        q8 = np.zeros((TC, cr, 128), np.int8)
        q8b = np.zeros((TC, cr, 128), np.int8)
        oh8 = np.zeros((TC, st, cr), np.int8)
        wb = np.zeros(TC, np.int32)
        super_of = np.zeros(TC, np.int32)
        if lib.tile_ell_fetch2(indptr, indices, data, n, vals, r8, q8, q8b,
                               oh8, wb, super_of) != 0:
            return None
    return vals, r8, q8, q8b, oh8, wb, super_of


def tile_ell_pack3(A, cr: int = 128, st: int = 16, span_cap: int = 120,
                   bs: int = 1):
    """Rolling-window supertile tile-ELL packing (ops/tile_ell.py v3):
    slot-rows carry absolute segment maps bounded by an individual span
    cap; chunks cut at CR slot-rows (no per-group CR tail rounding — the
    v2 padding fix for CR=128). Returns
    (vals, r8, q8, oh8, wb, super_of) or None. Serialized (global
    staging, the spgemm hazard lesson, ADVICE r1)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "tile_ell_plan3"):
        return None
    indptr, indices = _csr_arrays(A)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    n = A.shape[0]
    with _TILE_ELL_LOCK:
        TC = lib.tile_ell_plan3(indptr, indices, n, cr, st, span_cap, bs)
        if TC <= 0:
            return None
        vals = np.zeros((TC, cr, 128), np.float64)
        r8 = np.zeros((TC, cr, 128), np.int8)
        q8 = np.zeros((TC, cr, 128), np.int8)
        oh8 = np.zeros((TC, st, cr), np.int8)
        wb = np.zeros(TC, np.int32)
        super_of = np.zeros(TC, np.int32)
        if lib.tile_ell_fetch3(indptr, indices, data, n, vals, r8, q8,
                               oh8, wb, super_of) != 0:
            return None
    return vals, r8, q8, oh8, wb, super_of
