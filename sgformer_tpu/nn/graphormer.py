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
available for strict behavioral parity; and the reference's trimmed
``GraphNodeFeature`` never concatenates the graph token it defines
(``graphormer.py:50-73``; the "+1" shape comments are stale), so the
model it executes is token-free — ``use_graph_token=False`` reproduces
that exactly (verified against the reference's executing code in
``tests/test_reference_parity_zoo.py``), True (default) restores the
upstream token with an explicit zero bias row/column.  O(N²) attention:
medium-tier graphs only.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgformer_tpu.nn.layers import Dropout, TorchLinear


class QuantNoiseLinear(nn.Module):
    """Linear with fairseq ``quant_noise`` block dropout on the weight
    (``/root/reference/medium/graphormer.py:416-470``): at train time,
    random ``block_size``-column blocks of the weight are zeroed and the
    survivors scaled by ``1/(1-p)`` — the iPQ "training with quantization
    noise" regularizer.  ``p=0`` degrades to a plain :class:`TorchLinear`.
    Applied to the attention q/k/v/out projections as in the reference
    (``graphormer.py:177-187``)."""

    features: int
    p: float = 0.0
    block_size: int = 8
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from sgformer_tpu.nn.layers import Dropout, _torch_linear_kernel_init

        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_linear_kernel_init, (in_features, self.features)
        )
        if self.p > 0.0 and train:
            assert in_features % self.block_size == 0, (
                "in_features must be a multiple of qn_block_size"
            )
            rng = self.make_rng("quant_noise")
            nblocks = in_features // self.block_size
            drop = jax.random.bernoulli(
                rng, self.p, (nblocks, 1, self.features)
            )
            mask = jnp.broadcast_to(
                drop, (nblocks, self.block_size, self.features)
            ).reshape(in_features, self.features)
            kernel = jnp.where(mask, 0.0, kernel) / (1.0 - self.p)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bound = 1.0 / math.sqrt(in_features)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + bias.astype(y.dtype)
        return y


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
    """Pre-LN encoder layer (``graphormer.py:521-644``).  q/k/v/out run
    through :class:`QuantNoiseLinear` as in the reference MultiheadAttention
    (``graphormer.py:177-187``); ``q_noise=0`` is an exact plain Linear."""

    dim: int
    heads: int
    ffn_dim: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    q_noise: float = 0.0
    qn_block_size: int = 8

    @nn.compact
    def __call__(self, x, attn_bias, *, train: bool):
        drop = Dropout(self.dropout, deterministic=not train)
        h = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x)
        H, D = self.heads, self.dim // self.heads
        qn = dict(p=self.q_noise, block_size=self.qn_block_size)
        lead = h.shape[:-1]  # (N+1,) single graph or (G, N+1) padded batch
        q = QuantNoiseLinear(self.dim, name="q", **qn)(h, train=train)
        q = q.reshape(*lead, H, D)
        k = QuantNoiseLinear(self.dim, name="k", **qn)(h, train=train)
        k = k.reshape(*lead, H, D)
        v = QuantNoiseLinear(self.dim, name="v", **qn)(h, train=train)
        v = v.reshape(*lead, H, D)
        scores = (
            jnp.einsum("...nhd,...mhd->...hnm", q, k,
                       preferred_element_type=jnp.float32)
            / math.sqrt(D)
        )
        scores = scores + attn_bias
        w = jax.nn.softmax(scores, axis=-1)
        w = Dropout(self.attn_dropout, deterministic=not train)(w)
        attn = jnp.einsum(
            "...hnm,...mhd->...nhd", w, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        attn = QuantNoiseLinear(self.dim, name="out", **qn)(
            attn.reshape(*lead, self.dim), train=train
        )
        x = x + drop(attn)
        h = nn.LayerNorm(epsilon=1e-5, name="ffn_ln")(x)
        h = nn.gelu(TorchLinear(self.ffn_dim, name="fc1")(h), approximate=False)
        h = drop(h)
        h = TorchLinear(self.dim, name="fc2")(h)
        return x + drop(h)


class Graphormer(nn.Module):
    """``graphormer.py:954-1041`` — returns [N, C] logits (graph token
    dropped).

    Parity knobs beyond the round-1 core:

    - ``layerdrop``: fairseq LayerDrop (``graphormer.py:665-696``) — each
      encoder layer is skipped with prob p per training forward (rng
      collection ``"layerdrop"``); eval always runs every layer.
    - ``q_noise``/``qn_block_size``: quantization-noise block dropout on
      the attention projections (``graphormer.py:416-470,177-187``).
    - ``use_edge_bias``: per-head edge-feature attention bias from
      ``inputs['attn_edge_type']`` [N, N, Fe] (mean over feature columns).
      The reference keeps its edge-feature path commented out
      (``graphormer.py:109-111``, ``data_utils.py:254-259``), so this is
      off by default.
    - ``use_virtual_distance``: the reference DEFINES
      ``graph_token_virtual_distance`` (``graphormer.py:94``) but never
      applies it in forward — opt-in here applies the upstream semantics
      (learned per-head bias on the graph-token row/column).
    - ``inputs['attn_bias']`` (optional [N+1, N+1]): additive base bias —
      the collated multi-graph path uses -inf padding columns here
      (``data_utils.py:218-226``).
    """

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
    num_edges: int = 512 * 3
    layerdrop: float = 0.0
    q_noise: float = 0.0
    qn_block_size: int = 8
    use_edge_bias: bool = False
    use_virtual_distance: bool = False
    # The reference's trimmed GraphNodeFeature never concatenates its
    # graph_token into the sequence (graphormer.py:50-73 returns node
    # features only; the "+1" shape comments are stale fairseq remnants),
    # so the model it EXECUTES is token-free.  True (default) restores the
    # upstream Graphormer semantics; False reproduces the reference
    # exactly (tests/test_reference_parity_zoo.py).
    use_graph_token: bool = True
    # The reference's load_softmax head (embed_out + learned bias,
    # graphormer.py:995-1003) only exists when is_train=False and is
    # shape-broken there (fc(embed_dim->C) applied to a [.., C] tensor) —
    # its working head is ln(gelu(transform)) -> fc.  Off by default.
    use_embed_out: bool = False

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
        if self.use_graph_token:
            token = self.param(
                "graph_token", nn.initializers.normal(0.02), (1, dim)
            )
            tok = jnp.broadcast_to(
                token.astype(h.dtype), (*h.shape[:-2], 1, dim)
            )
            h = jnp.concatenate([tok, h], axis=-2)  # [..., N+1, dim]

        # per-head spatial bias, zero row/col for the graph token
        sp = nn.Embed(self.num_spatial, self.num_heads, name="spatial_pos_encoder")(
            jnp.clip(jnp.asarray(inputs["spatial_pos"]), 0, self.num_spatial - 1)
        )  # [..., N, N, H]
        bias = jnp.moveaxis(sp, -1, -3)  # [..., H, N, N]
        if self.use_edge_bias and inputs.get("attn_edge_type") is not None:
            ed = nn.Embed(self.num_edges + 1, self.num_heads,
                          name="edge_encoder")(
                jnp.clip(jnp.asarray(inputs["attn_edge_type"]), 0,
                         self.num_edges)
            )  # [N, N, Fe, H]
            bias = bias + jnp.moveaxis(ed.mean(axis=-2), -1, -3)
        if self.use_graph_token:
            pad_spec = [(0, 0)] * (bias.ndim - 2) + [(1, 0), (1, 0)]
            bias = jnp.pad(bias, pad_spec)
        if self.use_virtual_distance:
            assert self.use_graph_token, "virtual distance needs the token"
            t = self.param(
                "graph_token_virtual_distance",
                nn.initializers.normal(0.02), (1, self.num_heads),
            )[0]  # [H]
            # graph token attends / is attended with a learned distance
            bias = bias.at[..., 1:, 0].add(t[:, None])
            bias = bias.at[..., 0, :].add(t[:, None])
        if inputs.get("attn_bias") is not None:
            base = jnp.asarray(inputs["attn_bias"])  # [..., N+1, N+1]
            bias = bias + base[..., None, :, :]

        if self.layerdrop > 0.0 and train:
            keep = jax.random.uniform(
                self.make_rng("layerdrop"), (self.num_layers,)
            ) > self.layerdrop
        else:
            keep = None
        for i in range(self.num_layers):
            h_new = GraphormerLayer(
                dim, self.num_heads, ffn, dropout=self.dropout,
                attn_dropout=self.attn_dropout, q_noise=self.q_noise,
                qn_block_size=self.qn_block_size, name=f"layer_{i}",
            )(h, bias, train=train)
            h = h_new if keep is None else jnp.where(keep[i], h_new, h)

        # output head (graphormer.py:1018-1041): LN(gelu(Wx)) → vocab
        # projection + learned scalar bias → fc
        if self.use_graph_token:
            h = h[..., 1:, :]  # drop graph token
        h = nn.LayerNorm(epsilon=1e-5, name="head_ln")(
            nn.gelu(TorchLinear(dim, name="lm_head_transform")(h),
                    approximate=False)
        )
        if self.use_embed_out:
            h = TorchLinear(
                self.out_channels, use_bias=False, name="embed_out"
            )(h)
            lm_bias = self.param(
                "lm_output_learned_bias", nn.initializers.zeros, (1,)
            )
            h = h + lm_bias
        return TorchLinear(self.out_channels, name="fc")(h)


def collate_graphs(graphs: list, max_nodes: Optional[int] = None) -> dict:
    """Pad + stack per-graph Graphormer inputs into one [G, Nmax, ...]
    batch — the reference's collator helpers re-done in numpy
    (``/root/reference/medium/data_utils.py:200-242``):

    - integer ids get the +1 shift so 0 is the pad id (``pad_1d/2d/
      spatial_pos_unsqueeze``);
    - ``attn_bias`` [Nmax+1, Nmax+1] carries ``-inf`` on PAD KEY columns
      (``pad_attn_bias_unsqueeze``: pad filled -inf, then rows >= n zeroed
      over real columns), which masks padding out of every softmax;
    - the medium tier never invokes these helpers (node-level tasks);
      they exist for graph-level batching — capability parity here.

    ``graphs``: list of dicts from :func:`graphormer_inputs`.  Returns the
    stacked inputs dict (feed to ``Graphormer(...)(..., inputs=batch)``)
    plus ``num_nodes`` [G] and ``node_mask`` [G, Nmax].
    """
    sizes = [g["x"].shape[0] for g in graphs]
    n_max = max_nodes if max_nodes is not None else max(sizes)
    assert all(s <= n_max for s in sizes)
    G = len(graphs)
    fdim = graphs[0]["x"].shape[1]
    x = np.zeros((G, n_max, fdim), dtype=np.int64)
    in_deg = np.zeros((G, n_max), dtype=np.int64)
    out_deg = np.zeros((G, n_max), dtype=np.int64)
    spatial = np.zeros((G, n_max, n_max), dtype=np.int64)
    attn_bias = np.full((G, n_max + 1, n_max + 1), -np.inf, dtype=np.float32)
    mask = np.zeros((G, n_max), dtype=np.float32)
    for i, (g, n) in enumerate(zip(graphs, sizes)):
        x[i, :n] = g["x"] + 1
        in_deg[i, :n] = g["in_degree"] + 1
        out_deg[i, :n] = g["out_degree"] + 1
        spatial[i, :n, :n] = g["spatial_pos"] + 1
        attn_bias[i, : n + 1, : n + 1] = 0.0
        attn_bias[i, n + 1:, : n + 1] = 0.0  # pad QUERY rows see real keys
        mask[i, :n] = 1.0
    return {
        "x": x,
        "in_degree": in_deg,
        "out_degree": out_deg,
        "spatial_pos": spatial,
        "attn_bias": attn_bias,
        "num_nodes": np.asarray(sizes, dtype=np.int64),
        "node_mask": mask,
    }
