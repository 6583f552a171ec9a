"""GraphGPS — local GCN message passing + global Performer attention + FF
per layer (``/root/reference/medium/graphgps.py:8-135``).  The reference's
``performer_pytorch.SelfAttention`` becomes our positive-random-feature
attention with its own QKV/out projections."""

from __future__ import annotations

import math
from typing import Optional

import jax
from flax import linen as nn

from sgformer_tpu.nn.gcn import GCNConv
from sgformer_tpu.nn.layers import Dropout, TorchLinear
from sgformer_tpu.nn.norm import MaskedBatchNorm
from sgformer_tpu.ops.attention_variants import (
    create_projection_matrix,
    performer_attention,
)


class PerformerSelfAttention(nn.Module):
    """``performer_pytorch.SelfAttention`` equivalent (the reference's
    global-attention block, ``graphgps.py:27-29``): FAVOR+ positive-random
    -feature softmax attention.  Defaults mirror the package's: dim_head
    is 64 REGARDLESS of ``dim`` (the reference never overrides it), the
    feature count is ``int(dim_head·ln dim_head)``, QKV projections carry
    no bias, the out projection does, kernel eps 1e-4.  The random
    projection is drawn once at init and stored in ``batch_stats`` (the
    package keeps it as a non-trainable module buffer; batch_stats is the
    non-trainable state collection every trainer here already threads)."""

    dim: int
    heads: int = 4
    dim_head: int = 64
    nb_features: Optional[int] = None
    dropout: float = 0.0  # SelfAttention's own out-dropout (attn_dropout)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        m = self.nb_features or int(dh * math.log(dh))
        q = TorchLinear(inner, use_bias=False, name="to_q")(x).reshape(-1, h, dh)
        k = TorchLinear(inner, use_bias=False, name="to_k")(x).reshape(-1, h, dh)
        v = TorchLinear(inner, use_bias=False, name="to_v")(x).reshape(-1, h, dh)
        proj = self.variable(
            "batch_stats", "projection",
            lambda: create_projection_matrix(
                m, dh,
                self.make_rng("params") if self.is_initializing()
                else jax.random.PRNGKey(0),
            ),
        )
        out = performer_attention(
            q, k, v, projection=proj.value, tau=1.0,
            numerical_stabilizer=1e-4,
        )
        out = TorchLinear(self.dim, name="to_out")(out.reshape(-1, inner))
        return Dropout(self.dropout, deterministic=not train)(out)


class GPSLayer(nn.Module):
    """``graphgps.py:8-100``: h = BN(x + GCN(x)) + BN(x + Attn(x)); then
    h = BN(h + FF(h))."""

    dim: int
    num_heads: int = 4
    dropout: float = 0.0
    attn_dropout: float = 0.0
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        drop = Dropout(self.dropout, deterministic=not train)
        h_local = GCNConv(self.dim, name="local")(x, graph)
        h_local = x + h_local
        if self.use_bn:
            h_local = MaskedBatchNorm(name="norm1_local")(
                h_local, train=train, node_mask=node_mask
            )
        h_attn = PerformerSelfAttention(self.dim, heads=self.num_heads,
                                        dropout=self.attn_dropout,
                                        name="self_attn")(x, train=train)
        h_attn = x + drop(h_attn)
        if self.use_bn:
            h_attn = MaskedBatchNorm(name="norm1_attn")(
                h_attn, train=train, node_mask=node_mask
            )
        h = h_local + h_attn
        ff = drop(nn.relu(TorchLinear(self.dim * 2, name="ff1")(h)))
        ff = drop(TorchLinear(self.dim, name="ff2")(ff))
        h = h + ff
        if self.use_bn:
            h = MaskedBatchNorm(name="norm2")(h, train=train, node_mask=node_mask)
        return h


class GraphGPS(nn.Module):
    """``graphgps.py:102-135``."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.5
    attn_dropout: float = 0.0
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        drop = Dropout(self.dropout, deterministic=not train)
        x = TorchLinear(self.hidden_channels, name="pre_mp")(x)
        x = nn.relu(x)
        x = drop(x)
        for i in range(self.num_layers):
            x = GPSLayer(
                self.hidden_channels, num_heads=self.num_heads,
                dropout=self.dropout, attn_dropout=self.attn_dropout,
                use_bn=self.use_bn, name=f"layer_{i}",
            )(x, graph, train=train, node_mask=node_mask)
        return TorchLinear(self.out_channels, name="post_mp")(x)
