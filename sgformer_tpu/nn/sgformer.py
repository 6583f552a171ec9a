"""SGFormer: linear-attention branch + GNN branch + fusion head.

Spec: ``/root/reference/large/ours.py:241-286`` (large/100M variant:
GraphConv branch, tensors in) and ``/root/reference/medium/ours.py:179-223``
(medium variant: injected GCN backbone).  One flax module + config covers
all three reference tiers:

==========  ==================  ====================  ===============
tier        trans residual      GNN branch            trans_use_act
==========  ==================  ====================  ===============
medium      alpha-blend         ``gnn='gcn'``         False
large       (x+prev)/2          ``gnn='graphconv'``   True
100M        alpha-blend         ``gnn='graphconv'``   True
==========  ==================  ====================  ===============

The two parameter groups the reference exposes for per-branch weight decay
(``params1`` = attention branch, ``params2`` = gnn + head,
``large/ours.py:261-263``) map onto the top-level flax param-tree keys
``trans_conv`` vs ``{graph_conv|gcn|fc}`` — see
:func:`sgformer_tpu.train.optim.dual_weight_decay_adam`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.graph import Graph
from sgformer_tpu.nn.gcn import GCN
from sgformer_tpu.nn.graphconv import GraphConv
from sgformer_tpu.nn.layers import TorchLinear
from sgformer_tpu.nn.transconv import TransConv


@dataclasses.dataclass(frozen=True)
class SGFormerConfig:
    hidden_channels: int
    out_channels: int
    # attention branch
    trans_num_layers: int = 2
    trans_num_heads: int = 1
    trans_dropout: float = 0.5
    trans_use_bn: bool = True
    trans_use_residual: bool = True
    trans_use_weight: bool = True
    trans_use_act: bool = False
    trans_residual_mode: str = "alpha"  # 'alpha' (medium/100M) | 'mean' (large)
    # attention ablation: 'simple' | 'softmax' | 'gat' | 'performer'
    # (medium/ablation/parse.py:102-118)
    attention_kernel: str = "simple"
    # 'auto' (default): the fused pallas two-pass kernel on the TPU bf16
    # path (wins fwd+bwd at the arxiv shape), the XLA einsum path
    # elsewhere; 'xla' | 'pallas' force one
    attention_impl: str = "auto"
    alpha: float = 0.5
    # gnn branch
    gnn: str = "graphconv"  # 'graphconv' | 'gcn' | 'none'
    gnn_num_layers: int = 2
    gnn_dropout: float = 0.5
    gnn_use_bn: bool = True
    gnn_use_residual: bool = True
    gnn_use_weight: bool = True
    gnn_use_init: bool = False
    gnn_use_act: bool = True
    # fusion
    graph_weight: float = 0.8
    aggregate: str = "add"  # 'add' | 'cat'
    # sharding: mesh axis the node dimension is sharded over (None = single)
    axis_name: Optional[str] = None
    # activation dtype: 'f32' (default, exact parity) or 'bf16' (mixed
    # precision — params/norm-stats/logits stay f32, matmuls and the SpMM
    # message stream run at half the HBM traffic)
    compute_dtype: str = "f32"
    # rematerialize conv layers in backward (jax.checkpoint — trade FLOPs
    # for activation memory on big graphs)
    remat: bool = False

    @classmethod
    def medium(cls, hidden, out, **kw):
        kw.setdefault("gnn", "gcn")
        kw.setdefault("trans_residual_mode", "alpha")
        kw.setdefault("trans_use_act", False)
        return cls(hidden, out, **kw)

    @classmethod
    def large(cls, hidden, out, **kw):
        kw.setdefault("gnn", "graphconv")
        kw.setdefault("trans_residual_mode", "mean")
        kw.setdefault("trans_use_act", True)
        kw.setdefault("trans_num_layers", 1)
        kw.setdefault("gnn_num_layers", 1)
        return cls(hidden, out, **kw)

    @classmethod
    def papers100m(cls, hidden, out, **kw):
        kw.setdefault("gnn", "graphconv")
        kw.setdefault("trans_residual_mode", "alpha")
        kw.setdefault("trans_use_act", True)
        kw.setdefault("trans_num_layers", 1)
        kw.setdefault("gnn_num_layers", 1)
        return cls(hidden, out, **kw)


class SGFormer(nn.Module):
    config: SGFormerConfig

    def setup(self):
        cfg = self.config
        self.trans_conv = TransConv(
            cfg.hidden_channels,
            num_layers=cfg.trans_num_layers,
            num_heads=cfg.trans_num_heads,
            alpha=cfg.alpha,
            dropout=cfg.trans_dropout,
            use_bn=cfg.trans_use_bn,
            use_residual=cfg.trans_use_residual,
            use_weight=cfg.trans_use_weight,
            use_act=cfg.trans_use_act,
            residual_mode=cfg.trans_residual_mode,
            axis_name=cfg.axis_name,
            kernel=cfg.attention_kernel,
            impl=cfg.attention_impl,
            remat=cfg.remat,
        )
        if cfg.gnn == "graphconv":
            self.graph_conv = GraphConv(
                cfg.hidden_channels,
                num_layers=cfg.gnn_num_layers,
                dropout=cfg.gnn_dropout,
                use_bn=cfg.gnn_use_bn,
                use_residual=cfg.gnn_use_residual,
                use_weight=cfg.gnn_use_weight,
                use_init=cfg.gnn_use_init,
                use_act=cfg.gnn_use_act,
                axis_name=cfg.axis_name,
                remat=cfg.remat,
            )
        elif cfg.gnn == "gcn":
            self.gcn = GCN(
                cfg.hidden_channels,
                cfg.hidden_channels,
                num_layers=cfg.gnn_num_layers,
                dropout=cfg.gnn_dropout,
                use_bn=cfg.gnn_use_bn,
                axis_name=cfg.axis_name,
            )
        elif cfg.gnn != "none":
            raise ValueError(f"Invalid gnn type: {cfg.gnn}")
        self.fc = TorchLinear(cfg.out_channels)

    def __call__(self, x, graph: Graph, *, train: bool = False, node_mask=None):
        cfg = self.config
        if cfg.compute_dtype == "bf16":
            x = x.astype(jnp.bfloat16)
        x1 = self.trans_conv(x, train=train, node_mask=node_mask)

        if cfg.gnn == "graphconv":
            x2 = self.graph_conv(x, graph, train=train, node_mask=node_mask)
        elif cfg.gnn == "gcn":
            x2 = self.gcn(x, graph, train=train, node_mask=node_mask)
        else:
            x2 = None

        if x2 is not None:
            if cfg.aggregate == "add":
                out = cfg.graph_weight * x2 + (1.0 - cfg.graph_weight) * x1
            elif cfg.aggregate == "cat":
                out = jnp.concatenate([x1, x2], axis=1)
            else:
                raise ValueError(f"Invalid aggregate type: {cfg.aggregate}")
        else:
            out = x1
        return self.fc(out).astype(jnp.float32)

    def get_attentions(self, x):
        """Stacked per-layer [N, N] attention maps (``large/ours.py:278-281``);
        materializes N² — small graphs only."""
        _, attns = self.trans_conv(x, train=False, output_attn=True)
        return attns
