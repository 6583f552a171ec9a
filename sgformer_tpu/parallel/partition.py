"""Host-side graph partitioner for node-sharded (SP) execution.

Nodes are padded to a multiple of the shard count and split into contiguous
blocks (shard ``s`` owns rows ``[s*B, (s+1)*B)``).  Because the global edge
list is dst-sorted (see :mod:`sgformer_tpu.graph`), each shard's edges are a
contiguous range of the global COO arrays — the partitioner just slices,
relabels dst to shard-local coordinates, and pads every shard's edge count
to the max so the stacked [S, E_max] arrays are static-shape.  Padding
edges carry weight 0 and point at local row 0, so they contribute exactly
nothing to the aggregation.

The reference has no distributed execution at all (SURVEY.md §2.5); the
equivalent of this file in CUDA-land would be a METIS/NCCL graph
partitioner.  Contiguous block partitioning is the right first choice on
TPU: the attention branch is partition-agnostic (its cross-shard term is a
single psum regardless of layout), and the GCN branch's exchange volume is
bounded by the activation all_gather, which rides the ICI ring at full
bandwidth without any irregular routing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgformer_tpu.graph import Graph


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "src", "dst", "weight", "pyg_src", "pyg_dst", "pyg_weight",
        "chunks_fwd", "chunks_bwd", "halo_send_idx", "halo_local",
        "halo_remote",
    ],
    meta_fields=[
        "num_nodes", "total_nodes", "num_shards", "axis_name",
        "chunk_edges", "window_rows", "chunk_dtype", "chunk_interpret",
        "halo_rows",
    ],
)
@dataclasses.dataclass(frozen=True)
class ShardGraph:
    """Edge shards for node-sharded SPMD execution.

    In the *stacked* form every data field has a leading shard axis
    ([S, E_max]); inside shard_map each device holds its own [1, E_max]
    slice and :meth:`local` drops the leading axis.

    Attributes:
      src: int32 GLOBAL source node index (into the padded [0, total_nodes)
        range) of each edge owned by this shard.
      dst: int32 LOCAL destination row in [0, num_nodes).
      weight: float32 normalized edge weight; 0 on padding edges.
      num_nodes: nodes per shard (B).
      total_nodes: padded global node count (S * B).
      axis_name: mesh axis the node dimension is sharded over.
    """

    src: jax.Array
    dst: jax.Array
    weight: jax.Array
    num_nodes: int
    total_nodes: int
    num_shards: int
    axis_name: str
    pyg_src: Optional[jax.Array] = None
    pyg_dst: Optional[jax.Array] = None
    pyg_weight: Optional[jax.Array] = None
    # Per-shard MXU chunk plans (see sgformer_tpu/kernels): fwd gathers
    # global rows into local windows; bwd is the transpose (local rows →
    # global windows).  Tuples of (gather, local_dst, weight, window_id).
    chunks_fwd: Optional[tuple] = None
    chunks_bwd: Optional[tuple] = None
    chunk_edges: int = 0
    window_rows: int = 0
    chunk_dtype: str = "bf16"
    chunk_interpret: bool = False
    # Halo exchange (boundary-row all-to-all instead of the full activation
    # all_gather): send_idx [S, S, H] local rows shard i ships to shard j.
    # Edges are SPLIT into a local set (sources in this shard's rows) and a
    # halo set (sources in the received [S*H] table) so the all_to_all can
    # OVERLAP the local aggregation (XLA async collectives; SURVEY §2.5's
    # comm/compute-overlap mandate at the XLA level).  Each is a
    # (src_or_gather, dst, weight) triple, dst-sorted, weight-0 padded.
    halo_send_idx: Optional[jax.Array] = None
    halo_local: Optional[tuple] = None
    halo_remote: Optional[tuple] = None
    halo_rows: int = 0

    def local(self) -> "ShardGraph":
        """Drop the leading per-device shard axes (inside shard_map; works
        for both the 1-D [S, ...] and 2-D [dp, sp, ...] stacked forms)."""
        sq = lambda a, nd: None if a is None else a.reshape(a.shape[a.ndim - nd:])
        sqt = lambda t, nds: None if t is None else tuple(
            sq(a, nd) for a, nd in zip(t, nds)
        )
        return dataclasses.replace(
            self,
            src=sq(self.src, 1),
            dst=sq(self.dst, 1),
            weight=sq(self.weight, 1),
            pyg_src=sq(self.pyg_src, 1),
            pyg_dst=sq(self.pyg_dst, 1),
            pyg_weight=sq(self.pyg_weight, 1),
            chunks_fwd=sqt(self.chunks_fwd, (2, 2, 2, 1)),
            chunks_bwd=sqt(self.chunks_bwd, (2, 2, 2, 1)),
            halo_send_idx=sq(self.halo_send_idx, 2),
            halo_local=sqt(self.halo_local, (1, 1, 1)),
            halo_remote=sqt(self.halo_remote, (1, 1, 1)),
        )

    def propagate(self, x: jax.Array, kind: str = "gcn") -> jax.Array:
        """Sharded A_norm @ x.  Cross-shard source rows arrive either via a
        halo all-to-all of ONLY the boundary rows (when halo plans were
        built — traffic scales with the edge cut, not N) or a full
        activation all_gather; aggregation is the Pallas MXU chunk kernel
        when plans exist, else gather+segment_sum.  All variants match
        :meth:`sgformer_tpu.graph.Graph.propagate` exactly on real rows."""
        if kind == "gcn" and self.halo_send_idx is not None:
            return self._halo_propagate(x)
        x_full = jax.lax.all_gather(x, self.axis_name, axis=0, tiled=True)
        if kind == "gcn" and self.chunks_fwd is not None:
            return self._chunked_propagate(x_full)
        if kind == "gcn":
            src, dst, w = self.src, self.dst, self.weight
        else:
            assert self.pyg_src is not None, "pyg edges not partitioned"
            src, dst, w = self.pyg_src, self.pyg_dst, self.pyg_weight
        msgs = x_full.at[src].get(mode="promise_in_bounds")
        msgs = msgs * w[:, None].astype(x.dtype)
        return jax.ops.segment_sum(
            msgs, dst, num_segments=self.num_nodes, indices_are_sorted=True
        )

    def _halo_propagate(self, x: jax.Array) -> jax.Array:
        """Boundary-row exchange (SURVEY.md §7 step 5): ship the rows each
        peer's edges reference ([S, H, F] all-to-all over ICI), aggregate
        the LOCAL-source edges while the exchange is in flight (the two are
        independent, so XLA's async collectives overlap them), then fold in
        the halo-source edges from the received table.  Differentiable end
        to end (all_to_all transposes to all_to_all)."""
        buf = x.at[self.halo_send_idx].get(
            mode="promise_in_bounds")  # [S, H, F]
        recv = jax.lax.all_to_all(
            buf, self.axis_name, split_axis=0, concat_axis=0, tiled=False
        )  # [S, H, F]: slot i holds rows from shard i
        lsrc, ldst, lw = self.halo_local
        out = jax.ops.segment_sum(
            x.at[lsrc].get(mode="promise_in_bounds")
            * lw[:, None].astype(x.dtype),
            ldst, num_segments=self.num_nodes, indices_are_sorted=True,
        )
        hg, hdst, hw = self.halo_remote
        table = recv.reshape(-1, x.shape[-1])
        out = out + jax.ops.segment_sum(
            table.at[hg].get(mode="promise_in_bounds")
            * hw[:, None].astype(x.dtype),
            hdst, num_segments=self.num_nodes, indices_are_sorted=True,
        )
        return out

    def _chunked_propagate(self, x_full: jax.Array) -> jax.Array:
        import jax.numpy as _jnp

        from sgformer_tpu.kernels.chunks import ChunkedSpMM, ChunkPlan
        from sgformer_tpu.kernels.spmm import chunked_spmm

        C, W = self.chunk_edges, self.window_rows

        def plan(t, rows_out):
            g, d, w, wid = t
            return ChunkPlan(
                gather_idx=g, local_dst=d, weight=w, window_id=wid,
                chunk_edges=C, window_rows=W,
                num_rows_out=-(-rows_out // W) * W,
                num_chunks=g.shape[0],
            )

        sp = ChunkedSpMM(
            fwd=plan(self.chunks_fwd, self.num_nodes),
            bwd=plan(self.chunks_bwd, self.total_nodes),
            num_nodes=self.num_nodes,
            n_out_fwd=self.num_nodes,
            n_out_bwd=self.total_nodes,
        )
        dtype = _jnp.float32 if self.chunk_dtype == "f32" else _jnp.bfloat16
        return chunked_spmm(
            x_full, sp, compute_dtype=dtype, interpret=self.chunk_interpret
        )


def _shard_edges(src, dst, weight, indptr, num_shards, block, num_nodes):
    """Slice dst-sorted global edges into per-shard, locally-relabeled,
    equal-length (padded) arrays."""
    counts, slices = [], []
    for s in range(num_shards):
        lo = min(s * block, num_nodes)
        hi = min((s + 1) * block, num_nodes)
        e0, e1 = int(indptr[lo]), int(indptr[hi])
        slices.append((lo, e0, e1))
        counts.append(e1 - e0)
    e_max = max(1, max(counts))
    # round up to a VPU-friendly multiple to keep gathers tidy
    e_max = ((e_max + 127) // 128) * 128
    S = num_shards
    out_src = np.zeros((S, e_max), dtype=np.int32)
    out_dst = np.zeros((S, e_max), dtype=np.int32)
    out_w = np.zeros((S, e_max), dtype=np.float32)
    for s, (lo, e0, e1) in enumerate(slices):
        n = e1 - e0
        out_src[s, :n] = src[e0:e1]
        out_dst[s, :n] = dst[e0:e1] - lo
        out_w[s, :n] = weight[e0:e1]
    return out_src, out_dst, out_w


def _shard_chunk_plans(
    src, dst, w, indptr, num_shards, block, total, num_nodes,
    chunk_edges, window_rows,
):
    """Per-shard MXU chunk plans: fwd (global gather → local windows) and
    transpose (local gather → global windows), padded to one stacked shape.
    Padding chunks point at each plan's last window with weight 0."""
    from sgformer_tpu.kernels.chunks import _build_plan

    fwd_plans, bwd_plans = [], []
    for s in range(num_shards):
        lo = min(s * block, num_nodes)
        hi = min((s + 1) * block, num_nodes)
        e0, e1 = int(indptr[lo]), int(indptr[hi])
        src_s = src[e0:e1]
        dstl_s = dst[e0:e1] - lo
        w_s = w[e0:e1]
        fwd_plans.append(
            _build_plan(src_s, dstl_s, w_s, block, chunk_edges, window_rows)
        )
        order = np.argsort(src_s, kind="stable")
        bwd_plans.append(
            _build_plan(
                dstl_s[order], src_s[order], w_s[order], total,
                chunk_edges, window_rows,
            )
        )

    def stack(plans):
        nc = max(p.num_chunks for p in plans)
        gs, ds, ws, wids = [], [], [], []
        for p in plans:
            pad = nc - p.num_chunks
            g = np.asarray(p.gather_idx)
            d = np.asarray(p.local_dst)
            wt = np.asarray(p.weight)
            wid = np.asarray(p.window_id)
            if pad:
                last_w = p.num_rows_out // p.window_rows - 1
                g = np.concatenate([g, np.zeros((pad, p.chunk_edges), g.dtype)])
                d = np.concatenate([d, np.zeros((pad, p.chunk_edges), d.dtype)])
                wt = np.concatenate(
                    [wt, np.zeros((pad, p.chunk_edges), wt.dtype)]
                )
                wid = np.concatenate(
                    [wid, np.full(pad, last_w, dtype=wid.dtype)]
                )
            gs.append(g)
            ds.append(d)
            ws.append(wt)
            wids.append(wid)
        return (
            jnp.asarray(np.stack(gs)),
            jnp.asarray(np.stack(ds)),
            jnp.asarray(np.stack(ws)),
            jnp.asarray(np.stack(wids)),
        )

    return stack(fwd_plans), stack(bwd_plans)


def _build_halo(s_src: np.ndarray, s_dst: np.ndarray, s_w: np.ndarray,
                block: int, num_shards: int):
    """Halo plans from the per-shard edge arrays.

    Returns (send_idx [S, S, H], halo_local, halo_remote, H): shard i
    sends its rows ``send_idx[i][j]`` to shard j; the local set's sources
    index this shard's own rows, the halo set's index the [S*H] received
    table.  Traffic per step = S·H·F rows instead of the all_gather's
    total_nodes·F — proportional to the partition's edge cut, which the
    clustering reorder minimizes (docs/MULTIHOST.md)."""
    S = num_shards
    E = s_src.shape[1]
    need = [[np.empty(0, np.int64)] * S for _ in range(S)]
    for j in range(S):
        owners = s_src[j] // block
        for i in range(S):
            if i == j:
                continue
            need[i][j] = np.unique(s_src[j][owners == i]).astype(np.int64)
    H = max(
        [1] + [len(need[i][j]) for i in range(S) for j in range(S) if i != j]
    )
    send_idx = np.zeros((S, S, H), dtype=np.int32)
    for i in range(S):
        for j in range(S):
            if i == j:
                continue
            vs = need[i][j]
            send_idx[i, j, : len(vs)] = vs - i * block
    # split each shard's dst-sorted edges into local-source vs halo-source
    # sets (padded to per-set maxima): the local set aggregates while the
    # all_to_all is in flight
    loc_sets, halo_sets = [], []
    for j in range(S):
        src_j = s_src[j].astype(np.int64)
        owners = src_j // block
        local = owners == j
        loc_sets.append((src_j[local] - j * block, s_dst[j][local],
                         s_w[j][local]))
        g = np.empty(int((~local).sum()), dtype=np.int64)
        pos = 0
        hdst = s_dst[j][~local]
        hw = s_w[j][~local]
        src_h = src_j[~local]
        owners_h = owners[~local]
        for i in range(S):
            if i == j:
                continue
            m = owners_h == i
            if m.any():
                g[m] = i * H + np.searchsorted(need[i][j], src_h[m])
        halo_sets.append((g, hdst, hw))

    def _pad_sets(sets, fill_dst):
        cap = max(1, max(len(t[0]) for t in sets))
        a = np.zeros((S, cap), dtype=np.int32)
        d = np.full((S, cap), fill_dst, dtype=np.int32)
        w = np.zeros((S, cap), dtype=np.float32)
        for i, (gi, di, wi) in enumerate(sets):
            a[i, : len(gi)] = gi
            d[i, : len(di)] = di
            w[i, : len(wi)] = wi
        return a, d, w

    halo_local = _pad_sets(loc_sets, block - 1)
    halo_remote = _pad_sets(halo_sets, block - 1)
    return send_idx, halo_local, halo_remote, H


def partition_graph(
    graph: Graph,
    num_shards: int,
    axis_name: str = "sp",
    *,
    with_chunks: bool = False,
    with_halo: bool = False,
    chunk_edges: int = 512,
    window_rows: int = 128,
    chunk_dtype: str = "bf16",
    chunk_interpret: bool = False,
) -> ShardGraph:
    """Partition a preprocessed :class:`Graph` into ``num_shards`` node
    blocks (stacked [S, ...] arrays ready for shard_map with spec
    ``P(axis_name)``).  ``with_chunks`` additionally builds per-shard MXU
    SpMM chunk plans (fwd + transpose) so the sharded aggregation runs on
    the Pallas kernel."""
    n = graph.num_nodes
    block = -(-n // num_shards)  # ceil
    total = block * num_shards

    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    w = np.asarray(graph.gcn_weight)
    indptr = np.asarray(graph.indptr)
    s_src, s_dst, s_w = _shard_edges(src, dst, w, indptr, num_shards, block, n)

    chunks_fwd = chunks_bwd = None
    if with_chunks:
        chunks_fwd, chunks_bwd = _shard_chunk_plans(
            src, dst, w, indptr, num_shards, block, total, n,
            chunk_edges, window_rows,
        )
    halo_send = halo_local = halo_remote = None
    halo_rows = 0
    if with_halo:
        halo_send, halo_local, halo_remote, halo_rows = _build_halo(
            s_src, s_dst, s_w, block, num_shards
        )

    pyg = (None, None, None)
    if graph.pyg_src is not None:
        psrc = np.asarray(graph.pyg_src)
        pdst = np.asarray(graph.pyg_dst)
        pw = np.asarray(graph.pyg_weight)
        # pyg edges are dst-sorted but carry no indptr; derive one.
        p_indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(pdst, minlength=n), out=p_indptr[1:])
        pyg = _shard_edges(psrc, pdst, pw, p_indptr, num_shards, block, n)

    return ShardGraph(
        src=jnp.asarray(s_src),
        dst=jnp.asarray(s_dst),
        weight=jnp.asarray(s_w),
        num_nodes=int(block),
        total_nodes=int(total),
        num_shards=int(num_shards),
        axis_name=axis_name,
        pyg_src=None if pyg[0] is None else jnp.asarray(pyg[0]),
        pyg_dst=None if pyg[1] is None else jnp.asarray(pyg[1]),
        pyg_weight=None if pyg[2] is None else jnp.asarray(pyg[2]),
        chunks_fwd=chunks_fwd,
        chunks_bwd=chunks_bwd,
        chunk_edges=chunk_edges if with_chunks else 0,
        window_rows=window_rows if with_chunks else 0,
        chunk_dtype=chunk_dtype,
        chunk_interpret=chunk_interpret,
        halo_send_idx=None if halo_send is None else jnp.asarray(halo_send),
        halo_local=(
            None if halo_local is None
            else tuple(jnp.asarray(a) for a in halo_local)
        ),
        halo_remote=(
            None if halo_remote is None
            else tuple(jnp.asarray(a) for a in halo_remote)
        ),
        halo_rows=int(halo_rows),
    )


def pad_to_shards(arr: np.ndarray, total_nodes: int, fill=0) -> np.ndarray:
    """Pad the leading (node) dimension to the partitioned total."""
    arr = np.asarray(arr)
    pad = total_nodes - arr.shape[0]
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


def node_mask_for(num_nodes: int, total_nodes: int) -> np.ndarray:
    """[total_nodes] float32 mask: 1 on real rows, 0 on padding."""
    m = np.zeros(total_nodes, dtype=np.float32)
    m[:num_nodes] = 1.0
    return m


def idx_to_mask(idx: np.ndarray, total_nodes: int) -> np.ndarray:
    m = np.zeros(total_nodes, dtype=np.float32)
    m[np.asarray(idx)] = 1.0
    return m
