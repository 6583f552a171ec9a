"""Vanilla GCN — the medium-tier GNN branch / standalone baseline.

Spec: ``/root/reference/medium/models.py:14-63`` — a stack of PyG
``GCNConv`` layers (glorot-init linear, symmetric gcn_norm aggregation,
zero-init bias added after aggregation) with BatchNorm/ReLU/dropout between
layers and a plain final conv.  The gcn_norm edge weights (self-loops added
on top of the preprocessed graph, as PyG does internally) are precomputed
once — ``Graph.pyg_*`` fields (or their sharded counterparts).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.nn.layers import Dropout

from sgformer_tpu.nn.norm import MaskedBatchNorm


class GCNConv(nn.Module):
    """PyG GCNConv equivalent: ``out = A_norm @ (x W) + b``."""

    features: int

    @nn.compact
    def __call__(self, x, graph):
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = jnp.dot(x, kernel.astype(x.dtype))
        x = graph.propagate(x, kind="pyg")
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
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        dims = [self.hidden_channels] * (self.num_layers - 1) + [self.out_channels]
        for i, d in enumerate(dims[:-1]):
            x = GCNConv(d, name=f"conv_{i}")(x, graph)
            if self.use_bn:
                x = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_{i}")(
                    x, train=train, node_mask=node_mask
                )
            x = nn.relu(x)
            x = dropout(x)
        x = GCNConv(dims[-1], name=f"conv_{len(dims) - 1}")(x, graph)
        return x
