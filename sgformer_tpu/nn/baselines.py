"""Baseline model zoo — capability parity with the reference's comparison
models (``/root/reference/large/gnns.py:12-690`` and
``/root/reference/medium/models.py:14-385``), re-designed as jit-friendly
flax modules over the shared :class:`~sgformer_tpu.graph.Graph` container.

Every model exposes ``__call__(x, graph, *, train=False, node_mask=None)
-> [N, C] logits`` so all trainers (full-graph / sharded / batched) drive
them interchangeably.  Hop propagation uses ``graph.propagate`` (GCN-norm
DAD aggregation — Pallas MXU kernel when chunk plans exist); GAT uses the
edge-softmax op.  MultiLP is parameter-free and exposes ``predict``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.nn.layers import Dropout, TorchLinear
from sgformer_tpu.nn.norm import MaskedBatchNorm
from sgformer_tpu.ops.spmm import edge_softmax
import jax.ops


class MLP(nn.Module):
    """large/gnns.py:33-66: Linear stack with BN/ReLU/dropout."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph=None, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        dims = [self.hidden_channels] * (self.num_layers - 1) + [self.out_channels]
        for i, d in enumerate(dims[:-1]):
            x = TorchLinear(d, name=f"lin_{i}")(x)
            if self.use_bn:
                x = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_{i}")(
                    x, train=train, node_mask=node_mask
                )
            x = nn.relu(x)
            x = dropout(x)
        return TorchLinear(dims[-1], name=f"lin_{len(dims) - 1}")(x)


class LINK(nn.Module):
    """large/gnns.py:12-31: logistic regression on adjacency rows —
    out[i] = Σ_{j ∈ N(i)} W[j] + b (row-normalized below like the sparse
    one-hot A @ W product)."""

    num_nodes: int
    out_channels: int

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        w = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -(shape[0] ** -0.5), shape[0] ** -0.5
            ),
            (self.num_nodes, self.out_channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        agg = jax.ops.segment_sum(
            w.at[graph.edge_src].get(mode="promise_in_bounds"),
            graph.edge_dst,
            num_segments=graph.num_nodes,
            indices_are_sorted=True,
        )
        return agg + b


class SGC(nn.Module):
    """large/gnns.py:68-80: K-hop propagated features + one linear.
    SGCMem (gnns.py:82-125) is the same math computed hop-by-hop — which
    is exactly how this runs (lax loop over hops, no A^K materialized)."""

    out_channels: int
    hops: int = 2

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        for _ in range(self.hops):
            x = graph.propagate(x, kind="gcn")
        return TorchLinear(self.out_channels, name="lin")(x)


class SGCMem(SGC):
    """large/gnns.py:82-125 — SGC computed hop-by-hop to bound memory.
    This implementation already iterates ``graph.propagate`` per hop (A^K
    is never materialized), so the memory-lean variant IS the base class;
    the name exists for reference parity."""


class SGC2(nn.Module):
    """large/gnns.py:127-175: K-hop propagation then an MLP."""

    hidden_channels: int
    out_channels: int
    hops: int = 2
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        for _ in range(self.hops):
            x = graph.propagate(x, kind="gcn")
        return MLP(
            self.hidden_channels,
            self.out_channels,
            num_layers=self.num_layers,
            dropout=self.dropout,
            use_bn=self.use_bn,
            axis_name=self.axis_name,
            name="mlp",
        )(x, graph, train=train, node_mask=node_mask)


class SIGN(nn.Module):
    """large/gnns.py:222-270: concat of [x, Ax, …, A^K x] through the first
    linear (realized as per-hop linears summed — identical map, with the
    reference's single bias carried on ``hop_0``), then BN/ReLU/dropout and
    the remaining ``num_layers - 1`` linears.  ``num_layers`` counts the
    reference's ``lins`` (first projection + middles + head,
    gnns.py:226-233)."""

    hidden_channels: int
    out_channels: int
    hops: int = 2
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        hs = []
        h = x
        for k in range(self.hops + 1):
            if k > 0:
                h = graph.propagate(h, kind="gcn")
            hs.append(TorchLinear(self.hidden_channels, name=f"hop_{k}")(h))
        z = sum(hs)  # == lins[0](cat(embeddings)), gnns.py:262-264
        n_lins = max(self.num_layers, 2)
        for i in range(1, n_lins):
            if self.use_bn:
                z = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_{i - 1}")(
                    z, train=train, node_mask=node_mask
                )
            z = nn.relu(z)
            z = dropout(z)
            width = self.out_channels if i == n_lins - 1 else self.hidden_channels
            z = TorchLinear(width, name=f"lin_{i}")(z)
        return z


class GATConv(nn.Module):
    """PyG GATConv equivalent (used at large/gnns.py:272-310): per-head
    linear, additive attention with LeakyReLU(0.2), per-destination edge
    softmax, weighted aggregation.  Self-loops come from the preprocessed
    graph's edge set."""

    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0  # attention-coefficient dropout (PyG GATConv)

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False):
        H, D = self.heads, self.out_channels
        h = TorchLinear(H * D, use_bias=False, name="lin")(x).reshape(-1, H, D)
        a_src = self.param("att_src", nn.initializers.glorot_uniform(), (1, H, D))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (1, H, D))
        alpha_src = (h * a_src).sum(-1)  # [N, H]
        alpha_dst = (h * a_dst).sum(-1)
        e = nn.leaky_relu(
            alpha_src[graph.edge_src] + alpha_dst[graph.edge_dst],
            negative_slope=self.negative_slope,
        )
        w = edge_softmax(e, graph.edge_dst, graph.num_nodes)  # [E, H]
        if self.dropout > 0.0:
            w = Dropout(self.dropout, deterministic=not train)(w)
        chunks = getattr(graph, "chunks", None)
        if chunks is not None and chunks.fwd.edge_perm is not None:
            # MXU path: per-head runtime-weighted chunk kernel
            # (preprocess_graph(with_chunks=True, chunk_perm=True))
            import jax.numpy as _jnp

            from sgformer_tpu.kernels.spmm import chunked_spmm_edge_values

            dtype = (
                _jnp.float32 if graph.chunk_dtype == "f32" else _jnp.bfloat16
            )
            out = jnp.stack(
                [
                    chunked_spmm_edge_values(
                        h[:, hh], chunks, w[:, hh],
                        graph.edge_src, graph.edge_dst,
                        compute_dtype=dtype,
                        interpret=graph.chunk_interpret,
                    )
                    for hh in range(H)
                ],
                axis=1,
            )
        else:
            msgs = h[graph.edge_src] * w[..., None]
            out = jax.ops.segment_sum(
                msgs, graph.edge_dst, num_segments=graph.num_nodes,
                indices_are_sorted=True,
            )
        bias = self.param(
            "bias", nn.initializers.zeros, (H * D if self.concat else D,)
        )
        if self.concat:
            return out.reshape(-1, H * D) + bias
        return out.mean(axis=1) + bias


class GAT(nn.Module):
    """large/gnns.py:272-310: GATConv stack (concat heads on hidden layers,
    mean on the output layer), BN/ELU/dropout between layers."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    heads: int = 2
    out_heads: int = 1  # final-layer heads (gnns.py:289-290 default)
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        x = dropout(x)  # input dropout precedes the first conv (gnns.py:303)
        for i in range(self.num_layers - 1):
            x = GATConv(self.hidden_channels, heads=self.heads,
                        dropout=self.dropout, name=f"conv_{i}")(
                x, graph, train=train
            )
            if self.use_bn:
                x = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_{i}")(
                    x, train=train, node_mask=node_mask
                )
            x = nn.elu(x)
            x = dropout(x)
        return GATConv(
            self.out_channels, heads=self.out_heads, concat=False,
            dropout=self.dropout, name=f"conv_{self.num_layers - 1}",
        )(x, graph, train=train)


class MixHopLayer(nn.Module):
    """large/gnns.py:365-387: concat over j = 0..hops of ``A^j(x Wⱼ + bⱼ)``.
    The reference applies the linear BEFORE propagating, so the bias rides
    through the adjacency powers; equivalently ``(A^j x) Wⱼ + (A^j 1) bⱼ``
    — the ones-vector propagation tracks the bias factor with one extra
    [N, 1] column instead of re-propagating per hop order."""

    out_channels: int
    hops: int = 2

    @nn.compact
    def __call__(self, x, graph):
        import math

        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        outs = []
        h = x
        r = jnp.ones((x.shape[0], 1), x.dtype)
        for j in range(self.hops + 1):
            if j > 0:
                h = graph.propagate(h, kind="gcn")
                r = graph.propagate(r, kind="gcn")
            kernel = self.param(
                f"lin_{j}_kernel",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (fan_in, self.out_channels),
            )
            bias = self.param(
                f"lin_{j}_bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.out_channels,),
            )
            outs.append(
                jnp.dot(h, kernel.astype(h.dtype))
                + r * bias.astype(h.dtype)[None, :]
            )
        return jnp.concatenate(outs, axis=1)


class MixHop(nn.Module):
    """large/gnns.py:389-450: MixHopLayer stack + final projection.  The
    last layer maps to ``out_channels`` and joins ``final_project`` raw
    (no BN/act/dropout, gnns.py:426-450)."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    hops: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            width = self.out_channels if last else self.hidden_channels
            x = MixHopLayer(width, hops=self.hops, name=f"mix_{i}")(x, graph)
            if not last:
                if self.use_bn:
                    x = MaskedBatchNorm(
                        axis_name=self.axis_name, name=f"bn_{i}"
                    )(x, train=train, node_mask=node_mask)
                x = nn.relu(x)
                x = dropout(x)
        return TorchLinear(self.out_channels, name="final")(x)


class GCNJK(nn.Module):
    """large/gnns.py:452-499: GCN stack with jumping knowledge
    (cat or max over layer outputs) + final linear."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    jk_type: str = "cat"  # 'cat' | 'max'
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        from sgformer_tpu.nn.gcn import GCNConv

        dropout = Dropout(self.dropout, deterministic=not train)
        xs = []
        for i in range(self.num_layers):
            x = GCNConv(self.hidden_channels, name=f"conv_{i}")(x, graph)
            # the LAST conv output joins the jump connection RAW — no
            # bn/act/dropout (gnns.py:487-497 appends after the loop)
            if i < self.num_layers - 1:
                if self.use_bn:
                    x = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_{i}")(
                        x, train=train, node_mask=node_mask
                    )
                x = nn.relu(x)
                xs.append(x)
                x = dropout(x)
            else:
                xs.append(x)
        if self.jk_type == "max":
            z = jnp.stack(xs, 0).max(axis=0)
        else:
            z = jnp.concatenate(xs, axis=1)
        return TorchLinear(self.out_channels, name="final")(z)


class GATJK(nn.Module):
    """large/gnns.py:501-552: GAT stack with jumping knowledge."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    heads: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    jk_type: str = "cat"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        xs = []
        for i in range(self.num_layers):
            x = GATConv(self.hidden_channels, heads=self.heads, name=f"conv_{i}")(
                x, graph
            )
            # last conv joins the jump connection raw (gnns.py:540-550)
            if i < self.num_layers - 1:
                if self.use_bn:
                    x = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_{i}")(
                        x, train=train, node_mask=node_mask
                    )
                x = nn.elu(x)
                xs.append(x)
                x = dropout(x)
            else:
                xs.append(x)
        if self.jk_type == "max":
            z = jnp.stack(xs, 0).max(axis=0)
        else:
            z = jnp.concatenate(xs, axis=1)
        return TorchLinear(self.out_channels, name="final")(z)


class APPNP(nn.Module):
    """large/gnns.py:568-586 (APPNP_Net): 2-layer MLP then K personalized
    -pagerank propagation steps z ← (1-α)·A z + α·h."""

    hidden_channels: int
    out_channels: int
    dropout: float = 0.5
    K: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        x = dropout(x)
        x = nn.relu(TorchLinear(self.hidden_channels, name="lin1")(x))
        x = dropout(x)
        h = TorchLinear(self.out_channels, name="lin2")(x)
        z = h
        for _ in range(self.K):
            z = (1 - self.alpha) * graph.propagate(z, kind="gcn") + self.alpha * h
        return z


class GPRGNN(nn.Module):
    """large/gnns.py:588-686: MLP then learned per-hop weights γ_k over
    A^k h (PPR-initialized)."""

    hidden_channels: int
    out_channels: int
    dropout: float = 0.5
    dprate: float = 0.5
    K: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        dprop = Dropout(self.dprate, deterministic=not train)
        x = dropout(x)
        x = nn.relu(TorchLinear(self.hidden_channels, name="lin1")(x))
        x = dropout(x)
        h = TorchLinear(self.out_channels, name="lin2")(x)
        # PPR init: γ_k = α(1-α)^k, γ_K = (1-α)^K (gnns.py:600-606)
        def ppr_init(key, shape):
            k = jnp.arange(shape[0], dtype=jnp.float32)
            g = self.alpha * (1 - self.alpha) ** k
            return g.at[-1].set((1 - self.alpha) ** (shape[0] - 1))

        gamma = self.param("gamma", ppr_init, (self.K + 1,))
        h = dprop(h)
        z = gamma[0] * h
        for k in range(1, self.K + 1):
            h = graph.propagate(h, kind="gcn")
            z = z + gamma[k] * h
        return z


class H2GCN(nn.Module):
    """medium/models.py:229-340: heterophily GCN — ego/neighbor separation
    over the self-loop-free 1-hop (A1) and exact-2-hop (A2) neighborhoods,
    per-round concatenation and a final jump-concat classifier.  A1/A2 are
    precomputed on the host (``sgformer_tpu.graph.build_h2_graphs``; the
    reference builds them with torch_sparse.spspmm at models.py:263-311)
    and passed as extra Graph-like edge sets via ``h2_graphs``.

    Faithful to the reference head: bias-free xavier ``w_embed`` /
    ``w_classify`` and a **softmax** output (models.py:328-340 — the
    trainer's log_softmax then runs on probabilities, a reference
    behavior deliberately preserved).  The reference's A2 CONSTRUCTION is
    not preserved: ``indicator(A²−A−I)`` subtracts sparse VALUES, so on
    the self-loop-augmented medium graphs it keeps the diagonal and every
    1-hop pair (SURVEY.md §8); ``build_h2_graphs`` implements the exact
    2-hop set from the H2GCN paper instead."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    relu: bool = True
    softmax_output: bool = True

    @nn.compact
    def __call__(
        self, x, graph, *, train: bool = False, node_mask=None, h2_graphs=None
    ):
        assert h2_graphs is not None, (
            "H2GCN needs h2_graphs=(a1_graph, a2_graph) from "
            "sgformer_tpu.graph.build_h2_graphs"
        )
        a1, a2 = h2_graphs
        dropout = Dropout(self.dropout, deterministic=not train)
        w_embed = self.param(
            "w_embed",
            nn.initializers.xavier_uniform(),
            (x.shape[-1], self.hidden_channels),
        )
        h = jnp.dot(x, w_embed.astype(x.dtype))
        if self.relu:
            h = nn.relu(h)
        outs = [h]
        for _ in range(self.num_layers):
            h = jnp.concatenate(
                [a1.propagate(h, kind="gcn"), a2.propagate(h, kind="gcn")], axis=1
            )
            outs.append(h)
        z = jnp.concatenate(outs, axis=1)
        z = dropout(z)
        w_classify = self.param(
            "w_classify",
            nn.initializers.xavier_uniform(),
            (z.shape[-1], self.out_channels),
        )
        logits = jnp.dot(z, w_classify.astype(z.dtype))
        return jax.nn.softmax(logits) if self.softmax_output else logits


class MultiLP:
    """large/gnns.py:312-363: multi-hop label propagation (parameter-free):
    seed y from train labels, iterate ``z ← α·A^hops z + (1-α)·y`` (no
    clipping or re-clamping — the reference keeps the plain damped
    iteration).  ``mult_bin`` handles multiple binary tasks
    (``gnns.py:343-360``): each task gets its own 2-way one-hot pair and
    the positive-class column is read back out.  Seeding rules mirror the
    reference: [N,1] int labels → one-hot; multilabel float → used as-is."""

    def __init__(self, out_channels, alpha=0.5, hops=2, num_iters=50,
                 mult_bin=False):
        self.out_channels = out_channels
        self.alpha = alpha
        self.hops = hops
        self.num_iters = num_iters
        self.mult_bin = mult_bin

    def predict(self, graph, label, train_idx):
        import numpy as np

        n = graph.num_nodes
        label = np.asarray(label)
        train_idx = jnp.asarray(np.asarray(train_idx))
        tr = np.asarray(train_idx)
        if label.ndim == 1 or label.shape[1] == 1:
            onehot = jax.nn.one_hot(
                jnp.asarray(label.reshape(-1)[tr]), self.out_channels
            )
            y = jnp.zeros((n, self.out_channels)).at[train_idx].set(onehot)
        elif self.mult_bin:
            cols = []
            for task in range(label.shape[1]):
                cols.append(jax.nn.one_hot(jnp.asarray(label[tr, task]), 2))
            y = jnp.zeros((n, 2 * label.shape[1])).at[train_idx].set(
                jnp.concatenate(cols, axis=1)
            )
        else:
            y = jnp.zeros((n, self.out_channels)).at[train_idx].set(
                jnp.asarray(label[tr], dtype=jnp.float32)
            )
        z = y
        for _ in range(self.num_iters):
            for _ in range(self.hops):
                z = graph.propagate(z, kind="gcn")
            z = self.alpha * z + (1 - self.alpha) * y
        if self.mult_bin and label.ndim > 1 and label.shape[1] > 1:
            # read back each task's positive-class column (gnns.py:356-360)
            z = z[:, 1::2]
        return z
