"""Graphormer — transformer encoder with degree + spatial encodings
(``/root/reference/medium/graphormer.py:20-1051``, a trimmed fairseq
stack; factory config at ``medium/parse.py:61-69``).

Faithful pieces: integer "single-embedding" node features summed over
feature columns (``medium/data_utils.py:201-242``), in/out-degree
embeddings, per-head spatial-position attention bias, a prepended graph
token, pre-LN encoder layers with GELU FF, and the double output head
(LN∘GELU∘W → vocabulary projection + learned bias → final fc,
``graphormer.py:1018-1041``).

Deliberate non-replications (SURVEY.md §8): the reference feeds a RANDOM
``spatial_pos`` stub because its shortest-path extension is commented out
(``medium/data_utils.py:268``) — :func:`graphormer_inputs` computes real
capped BFS distances by default (``spatial='bfs'``) with the random stub
available for strict behavioral parity; and the reference's [N,N] bias is
misaligned with its N+1-token sequence — here the graph token gets an
explicit zero bias row/column.  O(N²) attention: medium-tier graphs only.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgformer_tpu.nn.layers import TorchLinear


def convert_to_single_emb(x: np.ndarray, offset: int = 512) -> np.ndarray:
    """``medium/data_utils.py:201-209``: shift each feature column into its
    own ``offset``-sized vocabulary slice (+1 keeps 0 as padding)."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    feature_offset = 1 + np.arange(0, offset * x.shape[1], offset, dtype=np.int64)
    return x.astype(np.int64) + feature_offset[None, :]


def graphormer_inputs(
    edge_index: np.ndarray,
    node_feat: np.ndarray,
    num_nodes: int,
    *,
    spatial: str = "bfs",
    max_dist: int = 510,
    seed: int = 0,
):
    """Host-side preprocessing (``medium/data_utils.py:244-283``): integer
    features, in/out degrees, and the [N, N] spatial-position matrix."""
    x_int = convert_to_single_emb(node_feat)
    src, dst = np.asarray(edge_index)
    in_degree = np.bincount(dst, minlength=num_nodes).astype(np.int64)
    out_degree = np.bincount(src, minlength=num_nodes).astype(np.int64)
    if spatial == "random":  # the reference's stub behavior
        rng = np.random.default_rng(seed)
        spatial_pos = rng.integers(0, 1000, size=(num_nodes, num_nodes))
    else:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import shortest_path

        a = sp.csr_matrix(
            (np.ones(len(src)), (src, dst)), shape=(num_nodes, num_nodes)
        )
        dist = shortest_path(a, method="D", unweighted=True, directed=False)
        dist[~np.isfinite(dist)] = max_dist
        spatial_pos = np.minimum(dist, max_dist).astype(np.int64)
    return {
        "x": x_int,
        "in_degree": np.minimum(in_degree, 511),
        "out_degree": np.minimum(out_degree, 511),
        "spatial_pos": spatial_pos,
    }


class GraphormerLayer(nn.Module):
    """Pre-LN encoder layer (``graphormer.py:521-644``)."""

    dim: int
    heads: int
    ffn_dim: int
    dropout: float = 0.0
    attn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_bias, *, train: bool):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        h = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x)
        H, D = self.heads, self.dim // self.heads
        q = TorchLinear(self.dim, name="q")(h).reshape(-1, H, D)
        k = TorchLinear(self.dim, name="k")(h).reshape(-1, H, D)
        v = TorchLinear(self.dim, name="v")(h).reshape(-1, H, D)
        scores = (
            jnp.einsum("nhd,mhd->hnm", q, k, preferred_element_type=jnp.float32)
            / math.sqrt(D)
        )
        scores = scores + attn_bias
        w = jax.nn.softmax(scores, axis=-1)
        w = nn.Dropout(self.attn_dropout, deterministic=not train)(w)
        attn = jnp.einsum(
            "hnm,mhd->nhd", w, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        attn = TorchLinear(self.dim, name="out")(attn.reshape(-1, self.dim))
        x = x + drop(attn)
        h = nn.LayerNorm(epsilon=1e-5, name="ffn_ln")(x)
        h = nn.gelu(TorchLinear(self.ffn_dim, name="fc1")(h))
        h = drop(h)
        h = TorchLinear(self.dim, name="fc2")(h)
        return x + drop(h)


class Graphormer(nn.Module):
    """``graphormer.py:954-1041`` — returns [N, C] logits (graph token
    dropped)."""

    out_channels: int
    embed_dim: int = 64
    num_layers: int = 2
    num_heads: int = 1
    ffn_dim: Optional[int] = None
    dropout: float = 0.0
    attn_dropout: float = 0.0
    num_atoms: int = 512 * 9
    num_degree: int = 512
    num_spatial: int = 1024

    @nn.compact
    def __call__(self, x, graph=None, *, train: bool = False, node_mask=None,
                 inputs: Optional[dict] = None):
        assert inputs is not None, (
            "Graphormer needs inputs=graphormer_inputs(edge_index, x, n)"
        )
        dim = self.embed_dim
        ffn = self.ffn_dim or dim
        n = inputs["x"].shape[0]

        atom = nn.Embed(self.num_atoms + 1, dim, name="atom_encoder")
        ids = jnp.clip(jnp.asarray(inputs["x"]), 0, self.num_atoms)
        h = atom(ids).sum(axis=-2)  # [N, dim]
        h = h + nn.Embed(self.num_degree, dim, name="in_degree_encoder")(
            jnp.clip(jnp.asarray(inputs["in_degree"]), 0, self.num_degree - 1)
        )
        h = h + nn.Embed(self.num_degree, dim, name="out_degree_encoder")(
            jnp.clip(jnp.asarray(inputs["out_degree"]), 0, self.num_degree - 1)
        )
        token = self.param(
            "graph_token", nn.initializers.normal(0.02), (1, dim)
        )
        h = jnp.concatenate([token.astype(h.dtype), h], axis=0)  # [N+1, dim]

        # per-head spatial bias, zero row/col for the graph token
        sp = nn.Embed(self.num_spatial, self.num_heads, name="spatial_pos_encoder")(
            jnp.clip(jnp.asarray(inputs["spatial_pos"]), 0, self.num_spatial - 1)
        )  # [N, N, H]
        bias = jnp.transpose(sp, (2, 0, 1))  # [H, N, N]
        bias = jnp.pad(bias, ((0, 0), (1, 0), (1, 0)))

        for i in range(self.num_layers):
            h = GraphormerLayer(
                dim, self.num_heads, ffn, dropout=self.dropout,
                attn_dropout=self.attn_dropout, name=f"layer_{i}",
            )(h, bias, train=train)

        # output head (graphormer.py:1018-1041): LN(gelu(Wx)) → vocab
        # projection + learned scalar bias → fc
        h = h[1:]  # drop graph token
        h = nn.LayerNorm(epsilon=1e-5, name="head_ln")(
            nn.gelu(TorchLinear(dim, name="lm_head_transform")(h))
        )
        h = TorchLinear(self.out_channels, use_bias=False, name="embed_out")(h)
        lm_bias = self.param("lm_output_learned_bias", nn.initializers.zeros, (1,))
        h = h + lm_bias
        return TorchLinear(self.out_channels, name="fc")(h)
