"""ctypes binding to the native graph-ops library (native/graphops.cpp),
with transparent NumPy fallbacks.

Build with ``make -C native`` (done automatically on first import if a
compiler is available). The native paths replace the O(E log E) numpy
lexsort with an O(E+N) counting sort and provide symmetrize/dedup and
edge-balanced partition cuts for multi-host sharding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.mma_sort_edges.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p, i32p
    ]
    lib.mma_build_row_ptr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p]
    lib.mma_degrees.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, f32p]
    lib.mma_symmetrize.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p
    ]
    lib.mma_symmetrize.restype = ctypes.c_int64
    lib.mma_balanced_row_cuts.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32, i32p]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    # Round-4 symbols — tolerate a stale .so (base ops keep working;
    # the new entry points report unavailable).
    try:
        lib.mma_partition_ldg.argtypes = [
            i64p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float, i32p
        ]
        lib.mma_sample_layered.argtypes = [
            i64p, i32p, ctypes.c_int64,       # row_ptr, src_sorted, n_nodes
            i32p, ctypes.c_int64,             # seeds, n_seeds
            i32p, ctypes.c_int32,             # fanouts, n_hops
            ctypes.c_uint64, ctypes.c_int32,  # rng_seed, n_threads
            i32p, i64p, i32p, i32p,           # out_nodes, hop_counts, src, dst
            ctypes.c_int64, ctypes.c_int64,   # node_cap, edge_cap
        ]
        lib.mma_sample_layered.restype = ctypes.c_int64
    except AttributeError:
        lib._mma_r4_symbols = False
    else:
        lib._mma_r4_symbols = True
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def sort_edges(src: np.ndarray, dst: np.ndarray, num_nodes: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable (dst-major, src-minor) sort; returns (src, dst, perm)."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    lib = _load()
    if lib is None or len(src) == 0:
        perm = np.lexsort((src, dst)).astype(np.int32)
        return src[perm], dst[perm], perm
    out_src = np.empty_like(src)
    out_dst = np.empty_like(dst)
    perm = np.empty_like(src)
    lib.mma_sort_edges(src, dst, len(src), num_nodes, out_src, out_dst, perm)
    return out_src, out_dst, perm


def build_row_ptr(dst_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    dst_sorted = np.ascontiguousarray(dst_sorted, np.int32)
    lib = _load()
    if lib is None:
        counts = np.bincount(dst_sorted, minlength=num_nodes)
        row_ptr = np.zeros(num_nodes + 1, np.int32)
        np.cumsum(counts, out=row_ptr[1:])
        return row_ptr
    row_ptr = np.empty(num_nodes + 1, np.int32)
    lib.mma_build_row_ptr(dst_sorted, len(dst_sorted), num_nodes, row_ptr)
    return row_ptr


def degrees(dst: np.ndarray, num_nodes: int) -> np.ndarray:
    dst = np.ascontiguousarray(dst, np.int32)
    lib = _load()
    if lib is None:
        return np.bincount(dst, minlength=num_nodes).astype(np.float32)
    deg = np.empty(num_nodes, np.float32)
    lib.mma_degrees(dst, len(dst), num_nodes, deg)
    return deg


def symmetrize(src: np.ndarray, dst: np.ndarray, num_nodes: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Undirected-graph semantics: both directions, no dups/self-loops."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    lib = _load()
    if lib is None or len(src) == 0:
        keep = src != dst
        pairs = np.concatenate(
            [np.stack([dst[keep], src[keep]], 1), np.stack([src[keep], dst[keep]], 1)]
        )
        pairs = np.unique(pairs, axis=0)
        return pairs[:, 1].copy(), pairs[:, 0].copy()
    out_src = np.empty(2 * len(src), np.int32)
    out_dst = np.empty(2 * len(src), np.int32)
    m = lib.mma_symmetrize(src, dst, len(src), num_nodes, out_src, out_dst)
    return out_src[:m].copy(), out_dst[:m].copy()


def sample_layered(
    row_ptr: np.ndarray,
    src_sorted: np.ndarray,
    seeds: np.ndarray,
    fanouts,
    rng_seed: int,
    n_threads: int,
    node_cap: int,
    edge_cap: int,
):
    """Multithreaded layered neighbor sample (C++; ``mma_sample_layered``).

    Returns ``(nodes, hop_counts, src_local, dst_local)`` — global node
    ids in discovery order (seeds, then each hop's new nodes), per-hop
    new-node counts, and LOCAL edge endpoints — or ``None`` when the
    native library is unavailable or a fanout exceeds 64 (the kernel's
    per-node stack buffer). Raises ``ValueError`` on cap overflow.
    """
    lib = _load()
    fanouts = np.ascontiguousarray(fanouts, np.int32)
    if (lib is None or not getattr(lib, "_mma_r4_symbols", False)
            or len(fanouts) == 0 or fanouts.max(initial=0) > 64):
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    src_sorted = np.ascontiguousarray(src_sorted, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    out_nodes = np.empty(node_cap, np.int32)
    hop_counts = np.empty(len(fanouts) + 1, np.int64)
    out_src = np.empty(edge_cap, np.int32)
    out_dst = np.empty(edge_cap, np.int32)
    n_edges = lib.mma_sample_layered(
        row_ptr, src_sorted, len(row_ptr) - 1,
        seeds, len(seeds), fanouts, len(fanouts),
        ctypes.c_uint64(rng_seed & (2**64 - 1)), n_threads,
        out_nodes, hop_counts, out_src, out_dst,
        node_cap, edge_cap,
    )
    if n_edges == -1:
        raise ValueError(f"sample overflowed node_cap={node_cap}")
    if n_edges == -2:
        raise ValueError(f"sample overflowed edge_cap={edge_cap}")
    n_nodes = int(hop_counts.sum())
    return (
        out_nodes[:n_nodes],
        hop_counts,
        out_src[:n_edges],
        out_dst[:n_edges],
    )


def partition_ldg(row_ptr: np.ndarray, src_sorted: np.ndarray,
                  num_parts: int, slack: float = 1.05):
    """Locality-aware streaming partition (LDG) over a symmetric CSR.

    Returns an (n,) int32 part assignment, or ``None`` when the native
    library is unavailable (callers fall back to contiguous cuts)."""
    lib = _load()
    if lib is None or not getattr(lib, "_mma_r4_symbols", False):
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    src_sorted = np.ascontiguousarray(src_sorted, np.int32)
    n = len(row_ptr) - 1
    part = np.empty(n, np.int32)
    lib.mma_partition_ldg(row_ptr, src_sorted, n, num_parts,
                          ctypes.c_float(slack), part)
    return part


def balanced_row_cuts(row_ptr: np.ndarray, num_parts: int) -> np.ndarray:
    """Contiguous row cut points giving ~equal edges per part."""
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    n = len(row_ptr) - 1
    lib = _load()
    if lib is None:
        total = int(row_ptr[-1])
        targets = (total * np.arange(1, num_parts)) // num_parts
        cuts = np.searchsorted(row_ptr[:-1], targets, side="left").astype(np.int32)
        return np.concatenate([[0], cuts, [n]]).astype(np.int32)
    cuts = np.empty(num_parts + 1, np.int32)
    lib.mma_balanced_row_cuts(row_ptr, n, num_parts, cuts)
    return cuts
