"""GraphTrans — GCN encoder followed by a standard transformer encoder
over the node sequence (``/root/reference/medium/graphtrans.py:10-109``).
The torch ``nn.TransformerEncoderLayer`` is post-LN with ReLU FF; the
encoder applies a final LayerNorm."""

from __future__ import annotations

from flax import linen as nn

from sgformer_tpu.nn.gcn import GCN
from sgformer_tpu.nn.layers import Dropout, TorchLinear


class TransformerEncoderLayer(nn.Module):
    """torch-style post-LN encoder layer."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        drop = Dropout(self.dropout, deterministic=not train)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="self_attn",
        )(x[None], x[None])[0]
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(attn))
        ff = TorchLinear(self.dim_feedforward, name="linear1")(x)
        ff = drop(nn.relu(ff))
        ff = TorchLinear(self.d_model, name="linear2")(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(ff))


class GraphTrans(nn.Module):
    """``graphtrans.py:92-109``: GCN → linear → (optional input LN) →
    transformer encoder stack → final LN → output linear."""

    hidden_channels: int
    out_channels: int
    gnn_emb_dim: int = 64
    d_model: int = 64
    num_layers: int = 2
    num_trans_layers: int = 3
    num_trans_head: int = 4
    dim_feedforward: int = 256
    dropout: float = 0.5
    trans_dropout: float = 0.1
    use_bn: bool = True
    norm_input: bool = True

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        h = GCN(
            self.hidden_channels, self.gnn_emb_dim,
            num_layers=self.num_layers, dropout=self.dropout,
            use_bn=self.use_bn, name="gnn",
        )(x, graph, train=train, node_mask=node_mask)
        h = TorchLinear(self.d_model, name="gnn2transformer")(h)
        if self.norm_input:
            h = nn.LayerNorm(epsilon=1e-5, name="input_ln")(h)
        for i in range(self.num_trans_layers):
            h = TransformerEncoderLayer(
                self.d_model, self.num_trans_head, self.dim_feedforward,
                dropout=self.trans_dropout, name=f"layer_{i}",
            )(h, train=train)
        h = nn.LayerNorm(epsilon=1e-5, name="final_ln")(h)
        return TorchLinear(self.out_channels, name="output")(h)
