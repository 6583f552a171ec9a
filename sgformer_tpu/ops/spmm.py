"""Sparse matrix-times-dense (SpMM) — the GCN aggregation hot op.

Replaces the reference's ``torch_sparse.matmul(SparseTensor(...), x)`` call
(``large/ours.py:33-34``) — a cuSPARSE CSR SpMM — with TPU-native paths:

- **XLA path** (default, correctness oracle): gather rows + weighted
  ``segment_sum`` over dst-sorted edges.  XLA lowers the sorted segment sum
  to an efficient scan; this is also the fallback on CPU test meshes.
- **Pallas path** (``sgformer_tpu/kernels/spmm.py``): fuses the gather,
  the edge-weight multiply, and the row-block accumulation in VMEM so the
  [E, D] message tensor never round-trips through HBM.

Both are wrapped in the same differentiable function; the VJP of SpMM(A, x)
w.r.t. x is SpMM(Aᵀ, g), which for our symmetric-normalized undirected
graphs is the same edge list with src/dst swapped (still materialized via
segment_sum on the transpose ordering).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def spmm(
    x: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    weight: Optional[jax.Array],
    num_nodes: int,
    *,
    sorted_by_dst: bool = True,
) -> jax.Array:
    """out[i] = Σ_{e: dst[e]==i} weight[e] * x[src[e]].

    Matches ``torch_sparse.matmul(SparseTensor(row=col, col=row, value), x)``
    at ``large/ours.py:33-34`` (messages flow src→dst, weighted by the
    normalized coefficient).
    """
    # edge ids are valid node ids by construction (pad edges use in-range
    # dummy rows with weight 0) — skip the fill-mode bounds select
    msgs = jnp.asarray(x).at[edge_src].get(mode="promise_in_bounds")
    if weight is not None:
        msgs = msgs * weight[:, None].astype(msgs.dtype)
    return jax.ops.segment_sum(
        msgs,
        edge_dst,
        num_segments=num_nodes,
        indices_are_sorted=sorted_by_dst,
    )


def edge_softmax(
    scores: jax.Array,
    edge_dst: jax.Array,
    num_nodes: int,
    *,
    sorted_by_dst: bool = True,
) -> jax.Array:
    """Per-destination softmax over incoming-edge scores ([E] or [E, H]) —
    the normalization inside PyG's ``GATConv`` (used by the reference GAT
    baselines, ``large/gnns.py:272-310``)."""
    mx = jax.ops.segment_max(
        scores, edge_dst, num_segments=num_nodes, indices_are_sorted=sorted_by_dst
    )
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    e = jnp.exp(scores - mx[edge_dst])
    den = jax.ops.segment_sum(
        e, edge_dst, num_segments=num_nodes, indices_are_sorted=sorted_by_dst
    )
    return e / jnp.maximum(den[edge_dst], 1e-16)


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, *, sorted_ids: bool = False
) -> jax.Array:
    """torch_scatter.scatter(..., reduce='mean') equivalent
    (used for e.g. ogbn-proteins edge-feature → node-feature means,
    ``large/dataset.py:335-345``)."""
    total = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )
    count = jax.ops.segment_sum(
        jnp.ones(data.shape[0], dtype=data.dtype),
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=sorted_ids,
    )
    return total / jnp.maximum(count, 1.0)[:, None]
