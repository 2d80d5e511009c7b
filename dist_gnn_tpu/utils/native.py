"""ctypes bridge to the native host runtime (csrc/ → libdistgnn_host.so).

The reference implements its host/device runtime in C++/CUDA (graph
extraction ``src/sampling/cuda/utils.cu``, pinned-memory management
``src/common/pin_memory.cc``).  On TPU the device side is XLA/Pallas, but the
host-side data plane (CSC construction from edge lists, subgraph extraction,
shard packing) is still native C++ (OpenMP), loaded here via ctypes with a
transparent numpy fallback when the library has not been built.

Build: ``make -C csrc`` (see csrc/Makefile).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "csrc", "libdistgnn_host.so"),
        os.path.join(os.path.dirname(__file__), "libdistgnn_host.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                _configure(lib)
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.dg_build_csc.argtypes = [
        ctypes.c_int64,  # num_edges
        ctypes.c_int64,  # num_nodes
        i32p,  # dst (rows)
        i32p,  # src (cols)
        f32p,  # probs or NULL
        i64p,  # out indptr [num_nodes+1]
        i32p,  # out indices [num_edges]
        f32p,  # out probs  [num_edges] or NULL
    ]
    lib.dg_build_csc.restype = ctypes.c_int
    lib.dg_extract_subcsc.argtypes = [
        ctypes.c_int64,  # num_cached
        i32p,  # cache_nids
        i64p,  # indptr
        i32p,  # indices
        f32p,  # probs or NULL
        i64p,  # out sub_indptr [num_cached+1] (pre-filled by dg_degrees pass)
        i32p,  # out sub_indices
        f32p,  # out sub_probs or NULL
    ]
    lib.dg_extract_subcsc.restype = ctypes.c_int
    lib.dg_build_alias.argtypes = [
        ctypes.c_int64,  # num_rows
        i64p,  # indptr
        f32p,  # weights
        f32p,  # out prob
        i32p,  # out alias
    ]
    lib.dg_build_alias.restype = ctypes.c_int
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dg_gather_rows.argtypes = [
        ctypes.c_int64,  # num_ids
        i64p,  # ids
        u8p,  # base bytes
        ctypes.c_int64,  # num_rows
        ctypes.c_int64,  # row_bytes
        u8p,  # out bytes [num_ids * row_bytes]
    ]
    lib.dg_gather_rows.restype = ctypes.c_int


def available() -> bool:
    return _find_lib() is not None


def _as_ptr(a: Optional[np.ndarray], ctype):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_csc(
    dst: np.ndarray, src: np.ndarray, num_nodes: int, probs: Optional[np.ndarray]
) -> Optional[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
    """CSC build (row = dst) via native lib; None → caller uses numpy path."""
    lib = _find_lib()
    if lib is None:
        return None
    num_edges = int(dst.shape[0])
    dst32 = np.ascontiguousarray(dst, dtype=np.int32)
    src32 = np.ascontiguousarray(src, dtype=np.int32)
    probs32 = np.ascontiguousarray(probs, dtype=np.float32) if probs is not None else None
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    indices = np.empty(num_edges, dtype=np.int32)
    out_probs = np.empty(num_edges, dtype=np.float32) if probs is not None else None
    rc = lib.dg_build_csc(
        num_edges,
        num_nodes,
        _as_ptr(dst32, ctypes.c_int32),
        _as_ptr(src32, ctypes.c_int32),
        _as_ptr(probs32, ctypes.c_float),
        _as_ptr(indptr, ctypes.c_int64),
        _as_ptr(indices, ctypes.c_int32),
        _as_ptr(out_probs, ctypes.c_float),
    )
    if rc != 0:
        return None
    if int(indptr[-1]) != num_edges:
        # the C counting sort skips out-of-range dst ids, which would
        # leave an uninitialized-garbage tail in indices silently
        # consumed as real edges — fail as loudly as the numpy fallback
        # does for the same inputs
        raise ValueError(
            f"build_csc: {num_edges - int(indptr[-1])} edges had dst "
            f"outside [0, {num_nodes}) — invalid COO input"
        )
    if num_edges < 2**31:
        indptr = indptr.astype(np.int32)
    return indptr, indices, out_probs


def extract_subcsc(
    cache_nids: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    probs: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Compacted sub-CSR of the given rows.

    The analog of ``ExtractIndptr``/``ExtractEdgeData``
    (``src/sampling/cuda/utils.cu:12-101``): returns (sub_indptr,
    sub_indices[, sub_probs]) where row i of the output is the full neighbor
    list of ``cache_nids[i]``.  Native when built, numpy otherwise.
    """
    cache_nids = np.ascontiguousarray(cache_nids, dtype=np.int32)
    indptr64 = np.ascontiguousarray(indptr, dtype=np.int64)
    deg = indptr64[cache_nids + 1] - indptr64[cache_nids]
    sub_indptr = np.zeros(len(cache_nids) + 1, dtype=np.int64)
    np.cumsum(deg, out=sub_indptr[1:])
    nnz = int(sub_indptr[-1])
    lib = _find_lib()
    if lib is not None:
        indices32 = np.ascontiguousarray(indices, dtype=np.int32)
        probs32 = np.ascontiguousarray(probs, dtype=np.float32) if probs is not None else None
        sub_indices = np.empty(nnz, dtype=np.int32)
        sub_probs = np.empty(nnz, dtype=np.float32) if probs is not None else None
        rc = lib.dg_extract_subcsc(
            len(cache_nids),
            _as_ptr(cache_nids, ctypes.c_int32),
            _as_ptr(indptr64, ctypes.c_int64),
            _as_ptr(indices32, ctypes.c_int32),
            _as_ptr(probs32, ctypes.c_float),
            _as_ptr(sub_indptr, ctypes.c_int64),
            _as_ptr(sub_indices, ctypes.c_int32),
            _as_ptr(sub_probs, ctypes.c_float),
        )
        if rc == 0:
            return sub_indptr, sub_indices, sub_probs
    # numpy fallback
    spans = [indices[indptr64[n] : indptr64[n + 1]] for n in cache_nids]
    sub_indices = (
        np.concatenate(spans).astype(np.int32) if spans else np.empty(0, dtype=np.int32)
    )
    sub_probs = None
    if probs is not None:
        pspans = [probs[indptr64[n] : indptr64[n + 1]] for n in cache_nids]
        sub_probs = (
            np.concatenate(pspans).astype(np.float32)
            if pspans
            else np.empty(0, dtype=np.float32)
        )
    return sub_indptr, sub_indices, sub_probs


def build_alias(indptr: np.ndarray, weights: np.ndarray):
    """Per-row Walker alias tables (prob[nnz] f32, alias[nnz] int32 —
    offsets within the row).  Native when built, numpy fallback."""
    indptr64 = np.ascontiguousarray(indptr, dtype=np.int64)
    weights32 = np.ascontiguousarray(weights, dtype=np.float32)
    nnz = len(weights32)
    prob = np.empty(nnz, dtype=np.float32)
    alias = np.empty(nnz, dtype=np.int32)
    lib = _find_lib()
    if lib is not None:
        rc = lib.dg_build_alias(
            len(indptr64) - 1,
            _as_ptr(indptr64, ctypes.c_int64),
            _as_ptr(weights32, ctypes.c_float),
            _as_ptr(prob, ctypes.c_float),
            _as_ptr(alias, ctypes.c_int32),
        )
        if rc == 0:
            return prob, alias
    # numpy fallback (two-stack per row)
    for r in range(len(indptr64) - 1):
        lo, hi = indptr64[r], indptr64[r + 1]
        d = hi - lo
        if d == 0:
            continue
        w = weights32[lo:hi].astype(np.float64)
        total = w.sum()
        if total <= 0:
            prob[lo:hi] = 1.0
            alias[lo:hi] = np.arange(d)
            continue
        scaled = w * d / total
        small = [i for i in range(d) if scaled[i] < 1.0]
        large = [i for i in range(d) if scaled[i] >= 1.0]
        while small and large:
            s_, l_ = small.pop(), large.pop()
            prob[lo + s_] = scaled[s_]
            alias[lo + s_] = l_
            scaled[l_] -= 1.0 - scaled[s_]
            (small if scaled[l_] < 1.0 else large).append(l_)
        for l_ in large:
            prob[lo + l_] = 1.0
            alias[lo + l_] = l_
        for s_ in small:
            prob[lo + s_] = 1.0
            alias[lo + s_] = s_
    return prob, alias


def gather_rows(
    base: np.ndarray, ids: np.ndarray, out: Optional[np.ndarray] = None
) -> np.ndarray:
    """``out[i] = base[ids[i]]`` with the OpenMP host gather (the staging
    hot path of the host-resident base tier); numpy fallback.

    ``base`` must be C-contiguous 2-D; rows for out-of-range ids are left
    as-is (callers pass pre-zeroed ``out`` and pre-masked ids)."""
    ids64 = np.ascontiguousarray(ids, dtype=np.int64)
    if out is None:
        out = np.zeros((len(ids64), base.shape[1]), dtype=base.dtype)
    # the native path memcpys base.strides[0] bytes per row into out — a
    # narrower caller-supplied out would be a heap overrun (the numpy
    # fallback raises a broadcast error for the same inputs; the native
    # path must fail as loudly)
    if out.shape != (len(ids64), base.shape[1]) or out.dtype != base.dtype:
        raise ValueError(
            f"gather_rows: out {out.shape}/{out.dtype} must be "
            f"[{len(ids64)}, {base.shape[1]}] of {base.dtype}"
        )
    lib = _find_lib()
    if (
        lib is not None
        and base.flags["C_CONTIGUOUS"]
        and out.flags["C_CONTIGUOUS"]
    ):
        row_bytes = base.strides[0]
        rc = lib.dg_gather_rows(
            len(ids64),
            _as_ptr(ids64, ctypes.c_int64),
            base.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            base.shape[0],
            row_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out
    valid = (ids64 >= 0) & (ids64 < base.shape[0])
    out[valid] = base[ids64[valid]]
    return out
