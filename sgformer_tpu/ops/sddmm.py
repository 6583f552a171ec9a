"""SDDMM — sampled dense-dense matmul: per-edge scores of node embeddings.

``scores[e] = q[dst[e]] · k[src[e]]`` (optionally per-head).  This is the
edge-score primitive behind GAT-style attention and NodeFormer's
edge-level regularizer (``/root/reference/medium/nodeformer.py:186-196``),
and the transpose counterpart of the SpMM gather.  On TPU the op is
gather-bound (two irregular row reads per edge); the XLA formulation below
fuses the gathers with the row-wise dot into one pass.  A chunked-MXU
variant (per-window Q_blk @ K_gatheredᵀ with an edge mask) only pays off
when many edges share a destination window — the SpMM chunk plans carry
exactly the layout needed, which is the planned extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sddmm(
    q: jax.Array,
    k: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
) -> jax.Array:
    """Per-edge dots.  q/k: [N, D] or [N, H, D] → scores [E] or [E, H]."""
    qe = jnp.asarray(q).at[edge_dst].get(mode="promise_in_bounds")
    ke = jnp.asarray(k).at[edge_src].get(mode="promise_in_bounds")
    return jnp.sum(qe * ke, axis=-1)


def sddmm_softmax_weights(
    q: jax.Array,
    k: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    num_nodes: int,
    *,
    scale: float = 1.0,
    sorted_by_dst: bool = True,
) -> jax.Array:
    """SDDMM scores + per-destination softmax — the sparse attention
    normalization (GAT / sparse-transformer style) in one call."""
    from sgformer_tpu.ops.spmm import edge_softmax

    scores = sddmm(q, k, edge_src, edge_dst) * scale
    return edge_softmax(
        scores, edge_dst, num_nodes, sorted_by_dst=sorted_by_dst
    )
