"""numpy-facing wrappers over the native kernels (None if unavailable)."""

from __future__ import annotations

import ctypes
import numpy as np

from sgformer_tpu.native.build import get_lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def fill_chunk_plan_native(
    indptr: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_nodes: int,
    window_rows: int,
    chunk_edges: int,
):
    """C++ chunk-plan fill; returns (gather, local_dst, weight, window_id)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    weight = np.ascontiguousarray(weight, dtype=np.float32)
    n_chunks = int(
        lib.count_chunks(_ptr(indptr, ctypes.c_int64), num_nodes,
                         window_rows, chunk_edges)
    )
    gather = np.zeros((n_chunks, chunk_edges), dtype=np.int32)
    ldst = np.zeros((n_chunks, chunk_edges), dtype=np.int32)
    w = np.zeros((n_chunks, chunk_edges), dtype=np.float32)
    wid = np.zeros(n_chunks, dtype=np.int32)
    lib.fill_chunks(
        _ptr(indptr, ctypes.c_int64),
        _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32),
        _ptr(weight, ctypes.c_float),
        num_nodes,
        window_rows,
        chunk_edges,
        _ptr(gather, ctypes.c_int32),
        _ptr(ldst, ctypes.c_int32),
        _ptr(w, ctypes.c_float),
        _ptr(wid, ctypes.c_int32),
    )
    return gather, ldst, w, wid


def fill_chunk_plan_sorted_native(
    indptr: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_nodes: int,
    window_rows: int,
    chunk_edges: int,
):
    """Like :func:`fill_chunk_plan_native` but sorts each window's edge
    span by src INSIDE the (threaded) C++ fill — callers pass dst-sorted
    edges directly and skip the host-side ``np.lexsort((src, dst // W))``
    + 4-array reindex (6 s of the 1M-node prep).  The stable in-window
    sort keeps equal-src ties in dst order, so the plan is bit-identical
    to the lexsort path.  Returns None when the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    weight = np.ascontiguousarray(weight, dtype=np.float32)
    n_chunks = int(
        lib.count_chunks(_ptr(indptr, ctypes.c_int64), num_nodes,
                         window_rows, chunk_edges)
    )
    gather = np.zeros((n_chunks, chunk_edges), dtype=np.int32)
    ldst = np.zeros((n_chunks, chunk_edges), dtype=np.int32)
    w = np.zeros((n_chunks, chunk_edges), dtype=np.float32)
    wid = np.zeros(n_chunks, dtype=np.int32)
    lib.fill_chunks_sorted(
        _ptr(indptr, ctypes.c_int64),
        _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32),
        _ptr(weight, ctypes.c_float),
        num_nodes,
        window_rows,
        chunk_edges,
        _ptr(gather, ctypes.c_int32),
        _ptr(ldst, ctypes.c_int32),
        _ptr(w, ctypes.c_float),
        _ptr(wid, ctypes.c_int32),
    )
    return gather, ldst, w, wid


def sample_neighbors_native(
    indptr: np.ndarray,
    indices: np.ndarray,
    frontier: np.ndarray,
    fanout: int,
    seed: int,
):
    """C++ fanout sampling; returns (src, dst) global edge arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    frontier = np.ascontiguousarray(frontier, dtype=np.int64)
    cap = len(frontier) * fanout
    out_src = np.empty(cap, dtype=np.int64)
    out_dst = np.empty(cap, dtype=np.int64)
    n = int(
        lib.sample_neighbors(
            _ptr(indptr, ctypes.c_int64),
            _ptr(indices, ctypes.c_int64),
            _ptr(frontier, ctypes.c_int64),
            len(frontier),
            fanout,
            ctypes.c_uint64(seed & (2**64 - 1)).value,
            _ptr(out_src, ctypes.c_int64),
            _ptr(out_dst, ctypes.c_int64),
        )
    )
    return out_src[:n], out_dst[:n]


def sample_batch_native(
    indptr: np.ndarray,
    indices: np.ndarray,
    seeds: np.ndarray,
    fanouts,
    node_cap: int,
    edge_cap: int,
    seed: int,
):
    """C++ full-batch sampler (multi-hop sample + relabel + self-loops +
    dst sort + gcn weights + padding); returns the filled arrays or None.
    ctypes releases the GIL for the call, so batches parallelize across
    Python threads."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    seeds = np.ascontiguousarray(seeds, dtype=np.int64)
    fan = np.ascontiguousarray(fanouts, dtype=np.int64)
    node_ids = np.empty(node_cap, dtype=np.int64)
    src = np.empty(edge_cap, dtype=np.int32)
    dst = np.empty(edge_cap, dtype=np.int32)
    w = np.empty(edge_cap, dtype=np.float32)
    mask = np.empty(node_cap, dtype=np.float32)
    trunc = np.zeros(2, dtype=np.int64)
    n_real = int(
        lib.sample_batch(
            _ptr(indptr, ctypes.c_int64),
            _ptr(indices, ctypes.c_int64),
            _ptr(seeds, ctypes.c_int64),
            len(seeds),
            _ptr(fan, ctypes.c_int64),
            len(fan),
            node_cap,
            edge_cap,
            ctypes.c_uint64(seed & (2**64 - 1)).value,
            _ptr(node_ids, ctypes.c_int64),
            _ptr(src, ctypes.c_int32),
            _ptr(dst, ctypes.c_int32),
            _ptr(w, ctypes.c_float),
            _ptr(mask, ctypes.c_float),
            _ptr(trunc, ctypes.c_int64),
        )
    )
    return node_ids, src, dst, w, mask, n_real, trunc


def lpa_cluster_native(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    iters: int,
    max_size: int,
    seed: int,
):
    """C++ label-propagation clustering (csrc ``lpa_cluster``): O(iters*E)
    threaded sweeps vs the numpy version's O(iters*E log E) lexsorts.
    Returns compacted labels, or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    labels = np.empty(num_nodes, dtype=np.int64)
    lib.lpa_cluster(
        _ptr(src, ctypes.c_int64),
        _ptr(dst, ctypes.c_int64),
        len(src),
        num_nodes,
        iters,
        max_size,
        seed,
        _ptr(labels, ctypes.c_int64),
    )
    _, labels = np.unique(labels, return_inverse=True)
    return labels


def cluster_pack_native(clusters: np.ndarray, slab_rows: int):
    """C++ boundary-aware best-fit-decreasing packing (csrc
    ``cluster_pack``): bit-identical to ``slabs.cluster_pack_perm``'s
    python heapq loop (which was ~20 s of the 1M-node prep).  Returns the
    perm, or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    clusters = np.ascontiguousarray(clusters, dtype=np.int64)
    perm = np.empty(len(clusters), dtype=np.int64)
    lib.cluster_pack(
        _ptr(clusters, ctypes.c_int64),
        len(clusters),
        slab_rows,
        _ptr(perm, ctypes.c_int64),
    )
    return perm
