"""Host-side edge chunking for the MXU SpMM kernel.

The dst-sorted edge list is cut into fixed-size **chunks** of ``C`` edges,
each assigned to a **window** of ``W`` consecutive destination rows.  Within
a chunk every edge's destination is expressed window-locally (0..W-1), so
the kernel can accumulate the chunk with one dense [W,C]x[C,F] matmul of a
weighted one-hot selector against the gathered source rows — the TPU answer
to cuSPARSE's CSR SpMM (reference call sites: ``large/ours.py:33-34``,
``100M/ours.py:80``).

Properties guaranteed by the builder:
- chunks are ordered by window; all chunks of a window are consecutive
  (the kernel accumulates over same-window revisits of its output block);
- every window emits >= 1 chunk, even if empty (so every output row-block
  is written);
- padding edge slots carry weight 0 and point at src 0 / local row 0.

The transpose chunking (edges re-sorted by src) drives the backward pass:
dx = Aᵀ @ g is the same kernel with gather/accumulate roles swapped.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# One pallas_call handles at most this many chunks; larger plans stream in
# window-aligned segments (bounds the [E, F] message buffer ~2 GB).
STREAM_MAX_CHUNKS = 8192


def compute_stream_segments(window_id: np.ndarray, max_chunks: int):
    """Host-side UNIFORM window-span segmentation for lax.scan streaming.

    Every segment covers exactly ``V`` consecutive windows (the last may
    run past the real window count — those rows are sliced off by the
    caller), so the per-segment output shape is the static ``[V*W, F]``
    and the whole streamed apply is ONE traced pallas_call inside a scan —
    compile time is independent of segment count (the concatenate-of-
    per-segment-calls form compiled one pallas_call per segment, which
    made 1M-node full-graph compiles impractical).

    Returns ``(nseg, V, S_max, bounds)`` with ``bounds`` the per-segment
    (start, end) chunk ranges; segments are padded to ``S_max`` chunks by
    the restacker.  ``S_max`` can exceed ``max_chunks`` only when a single
    window alone does (V == 1 floor)."""
    wid = np.asarray(window_id)
    nc = len(wid)
    n_windows = int(wid[-1]) + 1
    cum = np.zeros(n_windows + 1, dtype=np.int64)
    np.cumsum(np.bincount(wid, minlength=n_windows), out=cum[1:])

    def segs(V):
        nseg = -(-n_windows // V)
        lo = np.minimum(np.arange(nseg) * V, n_windows)
        hi = np.minimum((np.arange(nseg) + 1) * V, n_windows)
        starts, ends = cum[lo], cum[hi]
        return nseg, int((ends - starts).max()), starts, ends

    # binary-search the largest V whose segments all fit max_chunks,
    # treating the max per-segment count as monotone in V (alignment
    # shifts make it only approximately so — a missed larger V costs
    # padding efficiency, never correctness: the returned V's segments
    # are computed fresh below).  V=1 floor when one window alone
    # exceeds max_chunks.
    lo_v, hi_v = 1, n_windows
    while lo_v < hi_v:
        mid = (lo_v + hi_v + 1) // 2
        if segs(mid)[1] <= max_chunks:
            lo_v = mid
        else:
            hi_v = mid - 1
    V = lo_v
    nseg, s_max, starts, ends = segs(V)
    return nseg, V, s_max, list(zip(starts.tolist(), ends.tolist()))


def _restack_streamed(plan: "ChunkPlan", max_chunks: int) -> "ChunkPlan":
    """Re-pack a flat [nc, C] plan into the stacked [nseg, S_max, C]
    layout consumed by the scan-streamed apply.  Padding chunks carry
    gather 0 / weight 0 and repeat the segment's last window id (they
    accumulate exact zeros and keep the kernel's is_first/is_last window
    detection intact)."""
    wid = np.asarray(plan.window_id)
    g, ld, wt = (
        np.asarray(plan.gather_idx),
        np.asarray(plan.local_dst),
        np.asarray(plan.weight),
    )
    nseg, V, s_max, bounds = compute_stream_segments(wid, max_chunks)
    C = plan.chunk_edges
    G = np.zeros((nseg, s_max, C), np.int32)
    L = np.zeros((nseg, s_max, C), np.int32)
    Wt = np.zeros((nseg, s_max, C), np.float32)
    Wd = np.zeros((nseg, s_max), np.int32)
    for s, (a, b) in enumerate(bounds):
        k = b - a
        G[s, :k], L[s, :k], Wt[s, :k] = g[a:b], ld[a:b], wt[a:b]
        Wd[s, :k] = wid[a:b] - s * V
        if k < s_max:
            Wd[s, k:] = Wd[s, k - 1]
    return dataclasses.replace(
        plan,
        gather_idx=jnp.asarray(G),
        local_dst=jnp.asarray(L),
        weight=jnp.asarray(Wt),
        window_id=jnp.asarray(Wd),
        stream_shape=(nseg, s_max, V),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gather_idx", "local_dst", "weight", "window_id", "edge_perm"],
    meta_fields=[
        "chunk_edges", "window_rows", "num_rows_out", "num_chunks",
        "stream_shape",
    ],
)
@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """One direction (A or Aᵀ) of the chunked SpMM.

    gather_idx: [n_chunks, C] int32 — source row to gather for each edge slot.
    local_dst:  [n_chunks, C] int32 — window-local destination row (0..W-1).
    weight:     [n_chunks, C] f32   — edge weight (0 on padding slots).
    window_id:  [n_chunks]    int32 — output window of each chunk (ascending).
    num_rows_out: padded output row count (n_windows * W).
    """

    gather_idx: jax.Array
    local_dst: jax.Array
    weight: jax.Array
    window_id: jax.Array
    chunk_edges: int
    window_rows: int
    num_rows_out: int
    num_chunks: int
    # (nseg, S_max, V) when the plan is restacked for scan streaming: the
    # data fields then carry a leading segment axis ([nseg, S_max, C] /
    # [nseg, S_max]) and windows are segment-relative.  None = flat plan,
    # single pallas_call.
    stream_shape: Optional[tuple] = None
    # [n_chunks, C] ORIGINAL edge index of each slot (-1 padding): lets
    # runtime per-edge values (GAT attention weights) be scattered into
    # the kernel's slot layout (chunked_spmm_edge_values)
    edge_perm: Optional[jax.Array] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd"],
    meta_fields=["num_nodes", "n_out_fwd", "n_out_bwd"],
)
@dataclasses.dataclass(frozen=True)
class ChunkedSpMM:
    """Forward (A) + transpose (Aᵀ) chunk plans for one sparse matrix.

    For a square A both passes produce ``num_nodes`` rows; the node-sharded
    form is rectangular (forward: gather global rows → local rows;
    transpose: gather local rows → global rows), expressed via
    ``n_out_fwd`` / ``n_out_bwd`` overrides."""

    fwd: ChunkPlan
    bwd: ChunkPlan
    num_nodes: int
    n_out_fwd: Optional[int] = None
    n_out_bwd: Optional[int] = None

    @property
    def rows_fwd(self) -> int:
        return self.n_out_fwd if self.n_out_fwd is not None else self.num_nodes

    @property
    def rows_bwd(self) -> int:
        return self.n_out_bwd if self.n_out_bwd is not None else self.num_nodes


def _slot_edge_perm(indptr, ids, n_windows, C, W, num_chunks):
    """Scatter per-edge ids into the kernel's [n_chunks, C] slot layout
    (same span walk as the fill; -1 marks padding slots)."""
    perm = np.full((num_chunks, C), -1, dtype=np.int64)
    chunk = 0
    for w in range(n_windows):
        e0, e1 = int(indptr[w * W]), int(indptr[(w + 1) * W])
        k = max(1, -(-(e1 - e0) // C))
        for c in range(k):
            a = e0 + c * C
            b = min(a + C, e1)
            if b > a:
                perm[chunk, : b - a] = ids[a:b]
            chunk += 1
    return perm


def _build_plan(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_nodes: int,
    chunk_edges: int,
    window_rows: int,
    input_ids: Optional[np.ndarray] = None,
    with_perm: bool = False,
    allow_stream: bool = True,
) -> ChunkPlan:
    """Edges MUST be sorted by dst.  ``input_ids`` maps this call's input
    edge positions back to the caller's original ids (for transpose plans
    built from re-sorted edges)."""
    C, W = chunk_edges, window_rows
    n_windows = -(-num_nodes // W)
    # Within a window the edge order is free (the selector matmul
    # accumulates any permutation identically), so re-sort each window's
    # edges by SOURCE: the kernel's per-edge gather then reads HBM in
    # ascending address order, which the memory system rewards.
    #
    # Fast path (no edge-perm needed): edges are already dst-sorted, so
    # indptr is independent of the in-window order and the per-window src
    # sort happens INSIDE the threaded C++ fill (bit-identical plan;
    # skips the host lexsort + reindex, 6 s of the 1M-node prep).
    from sgformer_tpu.native.api import (
        fill_chunk_plan_native,
        fill_chunk_plan_sorted_native,
    )

    native = None
    if input_ids is None and not with_perm:
        indptr = np.zeros(n_windows * W + 1, dtype=np.int64)
        np.cumsum(np.bincount(dst, minlength=n_windows * W), out=indptr[1:])
        native = fill_chunk_plan_sorted_native(
            indptr, src, dst, weight, n_windows * W, W, C
        )
        ids = None
    if native is None:
        ids = (
            np.asarray(input_ids)
            if input_ids is not None
            else np.arange(len(src), dtype=np.int64)
        )
        if len(src):
            # one combined-key stable sort (3x cheaper than lexsort's
            # two passes at 10M edges), equivalent to
            # np.lexsort((src, dst // W)).  The src stride must exceed
            # max(src), NOT num_nodes: rectangular sharded fwd plans
            # carry GLOBAL source ids while num_nodes is the output-row
            # count, and a short stride interleaves windows (silently
            # wrong plans in this no-native-lib fallback).
            src_stride = np.int64(max(num_nodes, int(src.max()) + 1))
            order = np.argsort(
                (dst // W).astype(np.int64) * src_stride + src,
                kind="stable",
            )
            src, dst, weight, ids = (
                src[order], dst[order], weight[order], ids[order]
            )
        indptr = np.zeros(n_windows * W + 1, dtype=np.int64)
        np.cumsum(np.bincount(dst, minlength=n_windows * W), out=indptr[1:])
        native = fill_chunk_plan_native(
            indptr, src, dst, weight, n_windows * W, W, C
        )
    if native is not None:
        g, ld, wt, wid = native
        perm = (
            jnp.asarray(
                _slot_edge_perm(indptr, ids, n_windows, C, W, len(wid)),
                dtype=jnp.int32,
            )
            if with_perm
            else None
        )
        out = ChunkPlan(
            gather_idx=jnp.asarray(g),
            local_dst=jnp.asarray(ld),
            weight=jnp.asarray(wt),
            window_id=jnp.asarray(wid),
            chunk_edges=C,
            window_rows=W,
            num_rows_out=n_windows * W,
            num_chunks=len(wid),
            edge_perm=perm,
        )
        # perm plans feed chunked_spmm_edge_values, which maps per-edge
        # values into the FLAT slot layout — never restacked
        if len(wid) > STREAM_MAX_CHUNKS and not with_perm and allow_stream:
            out = _restack_streamed(out, STREAM_MAX_CHUNKS)
        return out

    g_idx, l_dst, wts, wids = [], [], [], []
    for w in range(n_windows):
        e0 = int(indptr[w * W])
        e1 = int(indptr[(w + 1) * W])
        n_chunks_w = max(1, -(-(e1 - e0) // C))
        for c in range(n_chunks_w):
            a = e0 + c * C
            b = min(e0 + (c + 1) * C, e1)
            k = b - a
            gi = np.zeros(C, dtype=np.int32)
            ld = np.zeros(C, dtype=np.int32)
            wt = np.zeros(C, dtype=np.float32)
            gi[:k] = src[a:b]
            ld[:k] = dst[a:b] - w * W
            wt[:k] = weight[a:b]
            g_idx.append(gi)
            l_dst.append(ld)
            wts.append(wt)
            wids.append(w)

    out = ChunkPlan(
        gather_idx=jnp.asarray(np.stack(g_idx)),
        local_dst=jnp.asarray(np.stack(l_dst)),
        weight=jnp.asarray(np.stack(wts)),
        window_id=jnp.asarray(np.asarray(wids, dtype=np.int32)),
        chunk_edges=C,
        window_rows=W,
        num_rows_out=n_windows * W,
        num_chunks=len(wids),
        edge_perm=(
            jnp.asarray(
                _slot_edge_perm(indptr, ids, n_windows, C, W, len(wids)),
                dtype=jnp.int32,
            )
            if with_perm
            else None
        ),
    )
    if len(wids) > STREAM_MAX_CHUNKS and not with_perm and allow_stream:
        out = _restack_streamed(out, STREAM_MAX_CHUNKS)
    return out


def _pad_plan(plan: ChunkPlan, nc_max: int) -> ChunkPlan:
    """Pad a plan to ``nc_max`` chunks (padding chunks target the last
    window with weight 0) so dynamically-built plans share one shape."""
    assert plan.stream_shape is None, "cannot pad a restacked streamed plan"
    pad = nc_max - plan.num_chunks
    if pad < 0:
        raise ValueError(f"nc_max {nc_max} < chunks {plan.num_chunks}")
    if pad == 0:
        return plan
    C = plan.chunk_edges
    last_w = plan.num_rows_out // plan.window_rows - 1
    z_i = jnp.zeros((pad, C), dtype=jnp.int32)
    return dataclasses.replace(
        plan,
        gather_idx=jnp.concatenate([plan.gather_idx, z_i]),
        local_dst=jnp.concatenate([plan.local_dst, z_i]),
        weight=jnp.concatenate(
            [plan.weight, jnp.zeros((pad, C), dtype=jnp.float32)]
        ),
        window_id=jnp.concatenate(
            [plan.window_id, jnp.full((pad,), last_w, dtype=jnp.int32)]
        ),
        edge_perm=(
            None
            if plan.edge_perm is None
            else jnp.concatenate(
                [plan.edge_perm, jnp.full((pad, C), -1, dtype=jnp.int32)]
            )
        ),
        num_chunks=nc_max,
    )


def max_chunks_bound(edge_cap: int, num_nodes: int, chunk_edges: int,
                     window_rows: int) -> int:
    """Worst-case chunk count for <= edge_cap edges over num_nodes rows:
    full chunks + one partial chunk (or one empty chunk) per window."""
    n_windows = -(-num_nodes // window_rows)
    return edge_cap // chunk_edges + n_windows


def build_chunks_fixed(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_nodes: int,
    *,
    chunk_edges: int = 512,
    window_rows: int = 128,
    nc_max: Optional[int] = None,
    edge_cap: Optional[int] = None,
) -> ChunkedSpMM:
    """Like :func:`build_chunks` but padded to a FIXED chunk count so
    per-batch dynamically-built plans (mini-batch training) all share one
    compiled step shape."""
    nc = nc_max if nc_max is not None else max_chunks_bound(
        edge_cap if edge_cap is not None else len(src),
        num_nodes, chunk_edges, window_rows,
    )
    # fixed plans are padded/concatenated to one shared shape, which the
    # stacked stream layout would break — always flat (batch buckets stay
    # within one pallas_call's message-buffer budget)
    sp = build_chunks(
        src, dst, weight, num_nodes,
        chunk_edges=chunk_edges, window_rows=window_rows,
        allow_stream=False,
    )
    return dataclasses.replace(
        sp, fwd=_pad_plan(sp.fwd, nc), bwd=_pad_plan(sp.bwd, nc)
    )


def build_chunks(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_nodes: int,
    *,
    chunk_edges: int = 1024,
    window_rows: int = 128,
    with_perm: bool = False,
    allow_stream: bool = True,
) -> ChunkedSpMM:
    """Build forward + transpose chunk plans from a dst-sorted COO list.
    ``with_perm`` additionally records each slot's original edge id so
    runtime per-edge values (attention weights) can drive the kernel
    (:func:`sgformer_tpu.kernels.spmm.chunked_spmm_edge_values`)."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    weight = np.asarray(weight)
    fwd = _build_plan(
        src, dst, weight, num_nodes, chunk_edges, window_rows,
        with_perm=with_perm, allow_stream=allow_stream,
    )
    order = np.argsort(src, kind="stable")
    bwd = _build_plan(
        dst[order], src[order], weight[order], num_nodes, chunk_edges,
        window_rows, input_ids=order, with_perm=with_perm,
        allow_stream=allow_stream,
    )
    return ChunkedSpMM(fwd=fwd, bwd=bwd, num_nodes=num_nodes)
