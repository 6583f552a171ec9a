"""DIFFormer — diffusion-based transformer baseline
(``/root/reference/medium/difformer.py:10-228``).

Kernels: ``simple`` (SGFormer-style linear attention but with a Σv
numerator term and a +N normalizer) and ``sigmoid`` (O(N²) sigmoid-score
attention).  Each layer adds a per-head GCN convolution of the VALUE
tensor over the input graph (``difformer.py:63-76`` — same in-degree DAD
normalization as the shared ``Graph.propagate``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.nn.layers import Dropout, TorchLinear


def difformer_attention(qs, ks, vs, kernel: str = "simple", output_attn=False):
    """``difformer.py:10-61``."""
    if kernel == "simple":
        qs = qs / jnp.linalg.norm(qs.reshape(-1))
        ks = ks / jnp.linalg.norm(ks.reshape(-1))
        n = qs.shape[0]
        kvs = jnp.einsum("lhm,lhd->hmd", ks, vs, preferred_element_type=jnp.float32)
        num = jnp.einsum("nhm,hmd->nhd", qs, kvs, preferred_element_type=jnp.float32)
        num = num + vs.sum(axis=0)[None]
        ks_sum = ks.sum(axis=0)
        den = jnp.einsum(
            "nhm,hm->nh", qs, ks_sum, preferred_element_type=jnp.float32
        )[..., None] + n
        out = (num / den).astype(vs.dtype)
        if output_attn:
            attn = (
                jnp.einsum("nhm,lhm->nlh", qs, ks, preferred_element_type=jnp.float32)
                / den[:, None, :, 0]
            )
            return out, attn.mean(axis=-1)
        return out
    if kernel == "sigmoid":
        scores = nn.sigmoid(
            jnp.einsum("nhm,lhm->nlh", qs, ks, preferred_element_type=jnp.float32)
        )
        attn = scores / scores.sum(axis=1, keepdims=True)
        out = jnp.einsum(
            "nlh,lhd->nhd", attn, vs, preferred_element_type=jnp.float32
        ).astype(vs.dtype)
        if output_attn:
            return out, attn.mean(axis=-1)
        return out
    raise ValueError(f"unknown DIFFormer kernel {kernel}")


class DIFFormerConv(nn.Module):
    """``difformer.py:87-145``."""

    out_channels: int
    num_heads: int = 1
    kernel: str = "simple"
    use_graph: bool = True
    use_weight: bool = True
    graph_weight: float = -1.0
    use_source: bool = False

    @nn.compact
    def __call__(self, query_input, source_input, graph=None, x0=None,
                 output_attn: bool = False):
        h, d = self.num_heads, self.out_channels
        qs = TorchLinear(d * h, name="Wq")(query_input).reshape(-1, h, d)
        ks = TorchLinear(d * h, name="Wk")(source_input).reshape(-1, h, d)
        if self.use_weight:
            vs = TorchLinear(d * h, name="Wv")(source_input).reshape(-1, h, d)
        else:
            vs = source_input.reshape(-1, 1, d)

        res = difformer_attention(qs, ks, vs, self.kernel, output_attn)
        attn_out, attn = res if output_attn else (res, None)

        if self.use_graph:
            n = vs.shape[0]
            flat = vs.reshape(n, -1)
            gcn_out = graph.propagate(flat, kind="gcn").reshape(vs.shape)
            if self.graph_weight > 0:
                out = (1 - self.graph_weight) * attn_out + self.graph_weight * gcn_out
            else:
                out = attn_out + gcn_out
        else:
            out = attn_out
        out = out.mean(axis=1)
        if self.use_source:
            out = out + x0
        if output_attn:
            return out, attn
        return out


class DIFFormer(nn.Module):
    """``difformer.py:147-228``: input MLP → alpha-residual conv stack →
    output MLP; LayerNorm between layers."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    num_heads: int = 1
    kernel: str = "simple"
    alpha: float = 0.5
    dropout: float = 0.5
    use_bn: bool = True
    use_residual: bool = True
    use_weight: bool = True
    use_graph: bool = True
    graph_weight: float = -1.0
    use_source: bool = False

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None,
                 output_attn: bool = False):
        dropout = Dropout(self.dropout, deterministic=not train)
        x = TorchLinear(self.hidden_channels, name="fc_in")(x)
        if self.use_bn:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_in")(x)
        x = nn.relu(x)
        x = dropout(x)
        x0 = x
        prev = x
        attns = []
        for i in range(self.num_layers):
            conv = DIFFormerConv(
                self.hidden_channels, num_heads=self.num_heads,
                kernel=self.kernel, use_graph=self.use_graph,
                use_weight=self.use_weight, graph_weight=self.graph_weight,
                use_source=self.use_source, name=f"conv_{i}",
            )
            if output_attn:
                x, attn = conv(x, x, graph, x0, output_attn=True)
                attns.append(attn)
            else:
                x = conv(x, x, graph, x0)
            if self.use_residual:
                x = self.alpha * x + (1 - self.alpha) * prev
            if self.use_bn:
                x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = dropout(x)
            prev = x
        out = TorchLinear(self.out_channels, name="fc_out")(x)
        if output_attn:
            return out, jnp.stack(attns, axis=0)
        return out
