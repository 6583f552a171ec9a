"""Vanilla GCN — the medium-tier GNN branch / standalone baseline.

Spec: ``/root/reference/medium/models.py:14-63`` — a stack of PyG
``GCNConv`` layers (glorot-init linear, symmetric gcn_norm aggregation,
zero-init bias added after aggregation) with BatchNorm/ReLU/dropout between
layers and a plain final conv.  The gcn_norm edge weights (self-loops added
on top of the preprocessed graph, as PyG does internally) are precomputed
once — ``Graph.pyg_*`` fields.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.graph import Graph
from sgformer_tpu.ops.spmm import spmm


class GCNConv(nn.Module):
    """PyG GCNConv equivalent: ``out = A_norm @ (x W) + b``."""

    features: int

    @nn.compact
    def __call__(self, x, graph: Graph):
        assert graph.pyg_src is not None, (
            "GCNConv needs preprocess_graph(..., with_pyg_norm=True)"
        )
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = jnp.dot(x, kernel.astype(x.dtype))
        x = spmm(
            x, graph.pyg_src, graph.pyg_dst, graph.pyg_weight, graph.num_nodes
        )
        return x + bias.astype(x.dtype)


class GCN(nn.Module):
    """medium/models.py:14-63 GCN stack; output dim = ``out_channels``
    (set to hidden_channels when injected as the SGFormer branch,
    ``medium/parse.py:99-101``)."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, *, train: bool = False):
        dropout = nn.Dropout(self.dropout, deterministic=not train)
        dims = [self.hidden_channels] * (self.num_layers - 1) + [self.out_channels]
        for i, d in enumerate(dims[:-1]):
            x = GCNConv(d, name=f"conv_{i}")(x, graph)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
            x = dropout(x)
        x = GCNConv(dims[-1], name=f"conv_{len(dims) - 1}")(x, graph)
        return x
