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
    data_fields=["src", "dst", "weight", "pyg_src", "pyg_dst", "pyg_weight"],
    meta_fields=["num_nodes", "total_nodes", "num_shards", "axis_name"],
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

    def local(self) -> "ShardGraph":
        """Drop the leading per-device shard axes (inside shard_map; works
        for both the 1-D [S, E] and 2-D [dp, sp, E] stacked forms — every
        data field is 1-D per device)."""
        sq = lambda a: None if a is None else a.reshape(a.shape[-1])
        return dataclasses.replace(
            self,
            src=sq(self.src),
            dst=sq(self.dst),
            weight=sq(self.weight),
            pyg_src=sq(self.pyg_src),
            pyg_dst=sq(self.pyg_dst),
            pyg_weight=sq(self.pyg_weight),
        )

    def propagate(self, x: jax.Array, kind: str = "gcn") -> jax.Array:
        """Sharded A_norm @ x: all_gather the [B, F] activation shards into
        the full [total_nodes, F] matrix over ICI, then aggregate this
        shard's (dst-sorted) edges with a local segment_sum.  Matches
        :meth:`sgformer_tpu.graph.Graph.propagate` exactly on real rows."""
        if kind == "gcn":
            src, dst, w = self.src, self.dst, self.weight
        else:
            assert self.pyg_src is not None, "pyg edges not partitioned"
            src, dst, w = self.pyg_src, self.pyg_dst, self.pyg_weight
        x_full = jax.lax.all_gather(x, self.axis_name, axis=0, tiled=True)
        msgs = jnp.take(x_full, src, axis=0) * w[:, None].astype(x.dtype)
        return jax.ops.segment_sum(
            msgs, dst, num_segments=self.num_nodes, indices_are_sorted=True
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


def partition_graph(
    graph: Graph, num_shards: int, axis_name: str = "sp"
) -> ShardGraph:
    """Partition a preprocessed :class:`Graph` into ``num_shards`` node
    blocks (stacked [S, ...] arrays ready for shard_map with spec
    ``P(axis_name)``)."""
    n = graph.num_nodes
    block = -(-n // num_shards)  # ceil
    total = block * num_shards

    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    w = np.asarray(graph.gcn_weight)
    indptr = np.asarray(graph.indptr)
    s_src, s_dst, s_w = _shard_edges(src, dst, w, indptr, num_shards, block, n)

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
