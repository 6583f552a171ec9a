"""GraphConv: the shallow GCN branch used by the large/100M tiers.

Spec: ``/root/reference/large/ours.py:10-94`` / ``100M/ours.py:56-152``.
The reference recomputes the degree normalization and rebuilds the sparse
adjacency EVERY forward (``large/ours.py:27-33``); here the symmetric
coefficient ``1/sqrt(d_in[dst]·d_in[src])`` is precomputed once on the host
(:func:`sgformer_tpu.graph.gcn_norm_weights`) and carried in the
:class:`~sgformer_tpu.graph.Graph` pytree — same math, zero per-step
structure work.  Under a node-sharded mesh the module receives a
``ShardGraph`` instead and the aggregation includes the cross-shard
feature exchange; BatchNorm statistics are psum'd over the mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.nn.layers import Dropout, TorchLinear
from sgformer_tpu.nn.norm import MaskedBatchNorm


class GraphConvLayer(nn.Module):
    """SpMM aggregation + optional Linear / initial-feature concat
    (``large/ours.py:10-42``)."""

    out_channels: int
    use_weight: bool = True
    use_init: bool = False

    @nn.compact
    def __call__(self, x, graph, x0):
        x = graph.propagate(x, kind="gcn")
        if self.use_init:
            x = jnp.concatenate([x, x0], axis=1)
            x = TorchLinear(self.out_channels, name="W")(x)
        elif self.use_weight:
            x = TorchLinear(self.out_channels, name="W")(x)
        return x


class GraphConv(nn.Module):
    """Input MLP + BatchNorm/ReLU/dropout conv stack with additive residual
    (``large/ours.py:45-94``)."""

    hidden_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    use_residual: bool = True
    use_weight: bool = True
    use_init: bool = False
    use_act: bool = True
    axis_name: Optional[str] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, graph, *, train: bool = False, node_mask=None):
        dropout = Dropout(self.dropout, deterministic=not train)
        layer_cls = nn.remat(GraphConvLayer) if self.remat else GraphConvLayer

        def bn(h, name):
            return MaskedBatchNorm(axis_name=self.axis_name, name=name)(
                h, train=train, node_mask=node_mask
            )

        x = TorchLinear(self.hidden_channels, name="fc_in")(x)
        if self.use_bn:
            x = bn(x, "bn_in")
        x = nn.relu(x)
        x = dropout(x)

        # NOTE: the reference never appends inside its layer loop
        # (large/ours.py:83-93), so BOTH the `x0` passed to each conv AND the
        # residual term are always the input-MLP activation.
        x0 = x
        for i in range(self.num_layers):
            x = layer_cls(
                self.hidden_channels,
                use_weight=self.use_weight,
                use_init=self.use_init,
                name=f"conv_{i}",
            )(x, graph, x0)
            if self.use_bn:
                x = bn(x, f"bn_{i}")
            if self.use_act:
                x = nn.relu(x)
            x = dropout(x)
            if self.use_residual:
                x = x + x0
        return x
