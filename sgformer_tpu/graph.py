"""Graph container + one-time host-side preprocessing.

TPU-first design notes
----------------------
The reference rebuilds its normalized adjacency every forward pass
(`/root/reference/large/ours.py:25-34`: degree(), value, SparseTensor are
recomputed per layer per step).  Here ALL graph structure work — making the
graph undirected, self-loops, sorting edges by destination, and the GCN
degree normalization — happens exactly once on the host in numpy, producing
a static-shape :class:`Graph` pytree that lives in HBM for the whole run.
The jitted train step then only consumes dense int32/float32 arrays.

Edges are stored COO sorted by destination node, which makes the
`segment_sum` aggregation path eligible for XLA's sorted-segment fast path
and gives the Pallas SpMM kernel contiguous per-row-block edge ranges
(CSR `indptr` is carried alongside).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "edge_src",
        "edge_dst",
        "gcn_weight",
        "indptr",
        "pyg_src",
        "pyg_dst",
        "pyg_weight",
        "chunks",
        "pyg_chunks",
        "node_perm",
    ],
    meta_fields=["num_nodes", "num_edges", "chunk_dtype", "chunk_interpret"],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """Static-shape COO/CSR graph resident in device memory.

    Attributes:
      edge_src: [E] int32 source node of each edge, sorted by ``edge_dst``.
      edge_dst: [E] int32 destination node of each edge (non-decreasing).
      gcn_weight: [E] float32 symmetric-normalized edge weight
        ``1/sqrt(d[dst]*d[src])`` with ``d`` the in-degree, matching the
        reference GraphConvLayer math (``large/ours.py:27-32``).
      indptr: [N+1] int32 CSR row pointers over the dst-sorted edges.
      num_nodes / num_edges: static Python ints (shape metadata).
    """

    edge_src: jax.Array
    edge_dst: jax.Array
    gcn_weight: jax.Array
    indptr: jax.Array
    num_nodes: int
    num_edges: int
    # PyG `gcn_norm`-style edges (extra self-loops + weight-aware degrees),
    # used by the medium-tier GCNConv backbone; None unless requested.
    pyg_src: Optional[jax.Array] = None
    pyg_dst: Optional[jax.Array] = None
    pyg_weight: Optional[jax.Array] = None
    # MXU SpMM plans (sgformer_tpu/kernels): ChunkedSpMM (gather path) or
    # SlabSpMM (gather-free clustered path); None = XLA segment_sum.
    chunks: Optional[object] = None
    pyg_chunks: Optional[object] = None
    chunk_dtype: str = "bf16"
    chunk_interpret: bool = False
    # slab mode only: perm[new_id] = old_id of the clustering reorder.
    # Node-indexed arrays (x, labels) must be taken as ``arr[node_perm]``
    # and index sets mapped through the inverse — Trainer does both.
    node_perm: Optional[jax.Array] = None

    @property
    def edge_index(self):
        return jnp.stack([self.edge_src, self.edge_dst])

    def propagate(self, x: jax.Array, kind: str = "gcn") -> jax.Array:
        """A_norm @ x — the GCN aggregation.  ``kind='gcn'`` uses the
        GraphConvLayer normalization (``large/ours.py:27-34``); ``'pyg'``
        uses PyG ``gcn_norm`` edges (medium-tier GCNConv).  Uses the Pallas
        MXU chunk kernel when plans were built (``with_chunks=True``), else
        the XLA gather+segment_sum path.  The sharded counterpart is
        :meth:`sgformer_tpu.parallel.ShardGraph.propagate` — model code is
        agnostic to which it gets."""
        import jax.numpy as _jnp

        from sgformer_tpu.ops.spmm import spmm

        plan = self.chunks if kind == "gcn" else self.pyg_chunks
        if plan is not None:
            dtype = _jnp.float32 if self.chunk_dtype == "f32" else _jnp.bfloat16
            from sgformer_tpu.kernels.slabs import SlabSpMM

            if isinstance(plan, SlabSpMM):
                from sgformer_tpu.kernels.slab_spmm import slab_spmm

                return slab_spmm(
                    x, plan, compute_dtype=dtype,
                    interpret=self.chunk_interpret,
                )
            from sgformer_tpu.kernels.spmm import chunked_spmm

            return chunked_spmm(
                x, plan, compute_dtype=dtype, interpret=self.chunk_interpret
            )
        if kind == "gcn":
            return spmm(
                x, self.edge_src, self.edge_dst, self.gcn_weight, self.num_nodes
            )
        assert self.pyg_src is not None, (
            "pyg edges missing: preprocess_graph(..., with_pyg_norm=True)"
        )
        return spmm(x, self.pyg_src, self.pyg_dst, self.pyg_weight, self.num_nodes)


# ---------------------------------------------------------------------------
# Host-side (numpy) edge-list transforms — run once, never inside jit.
# ---------------------------------------------------------------------------


def to_undirected(edge_index: np.ndarray) -> np.ndarray:
    """Symmetrize and deduplicate an edge list [2, E] (reference:
    ``torch_geometric.utils.to_undirected`` call at ``large/main.py:75``)."""
    src, dst = edge_index
    both = np.concatenate([np.stack([src, dst]), np.stack([dst, src])], axis=1)
    return coalesce(both)


def coalesce(edge_index: np.ndarray) -> np.ndarray:
    """Sort by (dst, src) and remove duplicate edges."""
    src, dst = edge_index
    key = dst.astype(np.int64) * (max(int(src.max(initial=0)), int(dst.max(initial=0))) + 1) + src
    order = np.argsort(key, kind="stable")
    key = key[order]
    keep = np.ones(len(key), dtype=bool)
    keep[1:] = key[1:] != key[:-1]
    return np.stack([src[order][keep], dst[order][keep]])


def remove_self_loops(edge_index: np.ndarray) -> np.ndarray:
    src, dst = edge_index
    mask = src != dst
    return np.stack([src[mask], dst[mask]])


def add_self_loops(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    loop = np.arange(num_nodes, dtype=edge_index.dtype)
    return np.concatenate([edge_index, np.stack([loop, loop])], axis=1)


def in_degree(dst: np.ndarray, num_nodes: int) -> np.ndarray:
    return np.bincount(dst, minlength=num_nodes).astype(np.float64)


def gcn_norm_weights(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Per-edge ``1/sqrt(d_in[dst] * d_in[src])`` with inf/nan -> 0.

    Matches ``large/ours.py:28-32``: degree is the IN-degree (count of dst
    occurrences), indexed at both endpoints, and non-finite values (isolated
    nodes) are zeroed.
    """
    d = in_degree(dst, num_nodes)
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(d)
    dinv[~np.isfinite(dinv)] = 0.0
    return (dinv[dst] * dinv[src]).astype(np.float32)


def gcn_norm_rs(dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """The separable factor ``rs = 1/sqrt(d_in)`` of the symmetric GCN
    normalization: ``gcn_norm_weights == rs[dst] * rs[src]`` exactly.
    The slab SpMM's int8-selector mode exploits this separability
    (kernels/slabs.py ``sep_rs``)."""
    d = in_degree(dst, num_nodes)
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(d)
    dinv[~np.isfinite(dinv)] = 0.0
    return dinv.astype(np.float32)


def sort_by_dst(edge_index: np.ndarray):
    src, dst = edge_index
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order]


def build_indptr(dst_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    counts = np.bincount(dst_sorted, minlength=num_nodes)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr


def preprocess_graph(
    edge_index: np.ndarray,
    num_nodes: int,
    *,
    undirected: bool = True,
    self_loops: bool = True,
    with_pyg_norm: bool = False,
    with_chunks: bool = False,
    chunk_perm: bool = False,
    chunk_edges: int = 1024,
    window_rows: int = 128,
    chunk_dtype: str = "bf16",
    chunk_interpret: bool = False,
    spmm_mode: str = "chunks",
    slab_rows: int = 24576,
    slab_geometry: dict | None = None,
    reorder: bool = False,
    dtype=np.float32,
) -> Graph:
    """One-time preprocessing pipeline (reference: ``large/main.py:74-79``):
    optionally symmetrize, then replace self-loops, then sort + normalize.

    ``with_pyg_norm`` additionally precomputes PyG ``gcn_norm`` edges for
    the medium-tier GCNConv backbone.  ``with_chunks`` builds the Pallas
    MXU SpMM plans (fwd + transpose) so ``propagate`` runs on the
    systolic array; ``chunk_dtype`` in {'bf16','f32'} picks the message
    dtype (accumulation is always f32).  ``spmm_mode='slab'`` uses the
    gather-free slab kernel: a structural clustering reorder relabels the
    nodes (recorded in ``Graph.node_perm``; Trainer permutes x/labels and
    maps split indices automatically) so most aggregation runs as
    VMEM-resident one-hot matmuls instead of per-edge HBM gathers.

    ``slab_geometry`` passes extra :func:`~sgformer_tpu.kernels.slabs.
    build_slabs` options through, notably ``{"hub_rows": K}`` (pin the
    top-K remote sources in VMEM — power-law graphs; ``-1``/``"auto"``
    decides from the remote-slot histogram, see ``slabs._auto_hub``) and
    ``{"slab_dtype": "int8"}`` (quantized aggregation with doubled
    resident range — pair with ``slab_rows=49152``; see BENCH.md
    "int8 slab mode" for when it wins).
    """
    edge_index = np.asarray(edge_index)
    if undirected:
        edge_index = to_undirected(edge_index)
    if self_loops:
        edge_index = remove_self_loops(edge_index)
        edge_index = add_self_loops(edge_index, num_nodes)
    node_perm = None
    auto_slab_dtype = None
    if with_chunks and spmm_mode in ("slab", "ssel"):
        from sgformer_tpu.kernels.slabs import (
            _AUTO_INT8_MAX_RANGES,
            _AUTO_INT8_SLAB_ROWS,
            choose_slab_dtype,
            reorder_for_slabs,
        )

        if chunk_dtype == "f32":
            # the single-buffered f32 slab scratch must fit VMEM (~16 MB)
            slab_rows = min(slab_rows, 8192)
        want_auto = (
            spmm_mode == "ssel" and chunk_dtype == "bf16"
            and (slab_geometry or {}).get("slab_dtype", "auto") == "auto"
            and slab_rows < _AUTO_INT8_SLAB_ROWS
            # outside int8's measured-win window the decision is always
            # bf16 (choose_slab_dtype would say so) — skip the second
            # packing entirely.  Guard on the same padded quantity
            # choose_slab_dtype checks so no graph pays the packing only
            # to be rejected.
            and max(num_nodes, slab_rows)
            <= _AUTO_INT8_MAX_RANGES * _AUTO_INT8_SLAB_ROWS
        )
        if want_auto:
            # one LPA pass, two packings: the int8 mode's value is the
            # REPACK at the doubled residency height (the 400K window,
            # BENCH.md "int8 slab mode"), so the decision happens here
            # where the reorder is owned
            (perm, inv, loc), (perm_hi, inv_hi, loc_hi) = reorder_for_slabs(
                edge_index, num_nodes, slab_rows=slab_rows,
                alt_slab_rows=_AUTO_INT8_SLAB_ROWS,
            )
            auto_slab_dtype = choose_slab_dtype(
                edge_index.shape[1], loc, loc_hi,
                max(num_nodes, slab_rows),
            )
            if auto_slab_dtype == "int8":
                perm, inv = perm_hi, inv_hi
                slab_rows = _AUTO_INT8_SLAB_ROWS
        else:
            perm, inv = reorder_for_slabs(
                edge_index, num_nodes, slab_rows=slab_rows
            )
        edge_index = np.stack([inv[edge_index[0]], inv[edge_index[1]]])
        node_perm = perm
    elif reorder:
        # cluster-contiguous relabel WITHOUT slab plans: contiguous-block
        # sharding then aligns shards with communities, shrinking the halo
        # exchange's edge cut (docs/MULTIHOST.md)
        from sgformer_tpu.kernels.slabs import reorder_for_slabs

        perm, inv = reorder_for_slabs(
            edge_index, num_nodes, slab_rows=num_nodes
        )
        edge_index = np.stack([inv[edge_index[0]], inv[edge_index[1]]])
        node_perm = perm
    src, dst = sort_by_dst(edge_index)
    weight = gcn_norm_weights(src, dst, num_nodes).astype(dtype)
    indptr = build_indptr(dst, num_nodes)
    pyg_src = pyg_dst = pyg_weight = None
    pyg_np = None
    if with_pyg_norm:
        psrc, pdst, pw = pyg_gcn_norm(np.stack([src, dst]), num_nodes)
        pyg_np = (psrc, pdst, pw)
        pyg_src = jnp.asarray(psrc, dtype=jnp.int32)
        pyg_dst = jnp.asarray(pdst, dtype=jnp.int32)
        pyg_weight = jnp.asarray(pw.astype(dtype))
    chunks = pyg_chunks = None
    if with_chunks and spmm_mode in ("slab", "ssel"):
        from sgformer_tpu.kernels.slabs import build_slabs

        geo = dict(slab_geometry or {})
        if undirected:
            # to_undirected closed the edge set under transpose and both
            # norm formulas are symmetric in (src, dst), so A == Aᵀ holds
            # by construction — skip _is_symmetric's two O(E log E) sorts
            # (8 s of the 1M-node prep)
            geo.setdefault("symmetric", True)
        if spmm_mode == "ssel":
            geo.setdefault("stream_sel", chunk_dtype)
            if chunk_dtype == "bf16":
                # int8 0/1 src selectors with x pre-scaled by rs=1/sqrt(d)
                # (w = rs[src]*rs[dst] separability); bf16-path-only — the
                # f32 path stays bit-exact vs the numpy oracle
                geo.setdefault("sep_rs", gcn_norm_rs(dst, num_nodes))
                if auto_slab_dtype is not None:
                    # measured per-graph policy (BENCH.md "int8 slab
                    # mode"), resolved at reorder time above: int8 +
                    # doubled residency only in the regime where the
                    # repack wins (the 400K window); bf16 elsewhere.
                    # The f32 path is untouched; explicit slab_dtype
                    # overrides (want_auto false above).
                    geo["slab_dtype"] = auto_slab_dtype
        def _slabs_with_fallback(s_, d_, w_):
            from sgformer_tpu.kernels.slabs import SelectorBudgetError

            try:
                return build_slabs(s_, d_, w_, num_nodes,
                                   slab_rows=slab_rows, **geo)
            except SelectorBudgetError as err:
                # the ssel selector streams would not fit HBM (power-law
                # local fill inflates them — round-5 clustered-1M): fall
                # back to the meta-mode kernel, whose selectors build
                # in-kernel (O(E) plan bytes, ~20% slower step)
                import sys as _sys

                print(
                    f"[slabs] {err}; falling back to meta-mode slab "
                    "kernel (in-kernel selector build)",
                    file=_sys.stderr,
                )
                geo_meta = {
                    k: v for k, v in geo.items()
                    if k not in ("stream_sel", "sep_rs", "slab_dtype",
                                 "hub_rows", "sel_budget_bytes")
                }
                return build_slabs(s_, d_, w_, num_nodes,
                                   slab_rows=slab_rows, **geo_meta)

        chunks = _slabs_with_fallback(src, dst, weight)
        if pyg_np is not None:
            pyg_chunks = _slabs_with_fallback(
                pyg_np[0], pyg_np[1], pyg_np[2]
            )
    elif with_chunks:
        from sgformer_tpu.kernels.chunks import build_chunks

        chunks = build_chunks(
            src, dst, weight, num_nodes,
            chunk_edges=chunk_edges, window_rows=window_rows,
            with_perm=chunk_perm,
        )
        if pyg_np is not None:
            pyg_chunks = build_chunks(
                pyg_np[0], pyg_np[1], pyg_np[2], num_nodes,
                chunk_edges=chunk_edges, window_rows=window_rows,
            )
    return Graph(
        edge_src=jnp.asarray(src, dtype=jnp.int32),
        edge_dst=jnp.asarray(dst, dtype=jnp.int32),
        gcn_weight=jnp.asarray(weight),
        indptr=jnp.asarray(indptr, dtype=jnp.int32),
        num_nodes=int(num_nodes),
        num_edges=int(len(src)),
        pyg_src=pyg_src,
        pyg_dst=pyg_dst,
        pyg_weight=pyg_weight,
        chunks=chunks,
        pyg_chunks=pyg_chunks,
        chunk_dtype=chunk_dtype,
        chunk_interpret=chunk_interpret,
        node_perm=(
            None if node_perm is None
            else jnp.asarray(node_perm, dtype=jnp.int32)
        ),
    )


def pyg_gcn_norm(
    edge_index: np.ndarray,
    num_nodes: int,
    *,
    add_self_loops_: bool = True,
    improved: bool = False,
):
    """PyG-style ``gcn_norm`` used by the medium-tier GCN backbone
    (``medium/models.py:22-38`` via ``torch_geometric.nn.GCNConv``):
    add-REMAINING self-loops (existing loops keep their weight; loop-less
    nodes get fill 1, or 2 if ``improved`` — PyG ``add_remaining_self_
    loops`` semantics, verified against the reference's executing code in
    ``tests/test_reference_parity_baselines.py``), degree from edge
    weights over dst, weight ``dinv[src]*dinv[dst]``.  Returns
    (src, dst, weight) sorted by dst.
    """
    edge_index = np.asarray(edge_index)
    src, dst = edge_index
    weight = np.ones(src.shape[0], dtype=np.float64)
    if add_self_loops_:
        fill = 2.0 if improved else 1.0
        mask = src != dst
        loop_weight = np.full(num_nodes, fill)
        # existing self-loop weights are PRESERVED, not doubled — on the
        # canonically preprocessed graph (one unit loop per node) this
        # makes pyg weights identical to gcn_norm_weights
        loop_weight[src[~mask]] = weight[~mask]
        loop = np.arange(num_nodes, dtype=src.dtype)
        src = np.concatenate([src[mask], loop])
        dst = np.concatenate([dst[mask], loop])
        weight = np.concatenate([weight[mask], loop_weight])
    deg = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(deg, dst, weight)
    with np.errstate(divide="ignore"):
        dinv = deg**-0.5
    dinv[~np.isfinite(dinv)] = 0.0
    weight = dinv[src] * weight * dinv[dst]
    order = np.argsort(dst, kind="stable")
    return (
        src[order].astype(np.int32),
        dst[order].astype(np.int32),
        weight[order].astype(np.float32),
    )


def build_h2_graphs(edge_index: np.ndarray, num_nodes: int):
    """A1/A2 edge sets for H2GCN (reference builds them with
    ``torch_sparse.spspmm`` at ``medium/models.py:263-311``): A1 is the
    self-loop-free 1-hop adjacency, A2 the EXACT 2-hop neighborhood
    (pattern of A² minus A minus the diagonal), both DAD-normalized.
    Returns two :class:`Graph` objects (gcn edge sets only)."""
    import scipy.sparse as sp

    e = to_undirected(remove_self_loops(np.asarray(edge_index)))
    src, dst = e
    a = sp.csr_matrix(
        (np.ones(len(src)), (dst, src)), shape=(num_nodes, num_nodes)
    )
    a.data[:] = 1.0
    a2 = a @ a
    a2.setdiag(0)
    a2 = (a2 > 0).astype(np.float64)
    a2 = a2 - a2.multiply((a > 0).astype(np.float64))  # drop 1-hop pairs
    a2.eliminate_zeros()

    def _graph_from(mat) -> Graph:
        coo = mat.tocoo()
        ei = np.stack([coo.col, coo.row]).astype(np.int64)  # (src, dst)
        return preprocess_graph(
            ei, num_nodes, undirected=False, self_loops=False
        )

    return _graph_from(a), _graph_from(a2)


def subgraph(
    node_idx: np.ndarray, edge_index: np.ndarray, num_nodes: int
) -> tuple[np.ndarray, int]:
    """Relabeled node-induced subgraph (reference: PyG ``subgraph`` with
    ``relabel_nodes=True`` at ``large/main-batch.py:139``).  Keeps edges with
    BOTH endpoints in ``node_idx``; returns [2, E_sub] relabeled to
    ``0..len(node_idx)-1`` and the subgraph node count."""
    node_idx = np.asarray(node_idx)
    mapping = np.full(num_nodes, -1, dtype=np.int64)
    mapping[node_idx] = np.arange(len(node_idx))
    src, dst = edge_index
    mask = (mapping[src] >= 0) & (mapping[dst] >= 0)
    sub = np.stack([mapping[src[mask]], mapping[dst[mask]]])
    return sub, len(node_idx)
