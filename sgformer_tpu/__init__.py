"""SGFormer-TPU: a TPU-native graph-transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
SGFormer reference (NeurIPS'23, qitianwu/SGFormer): one-layer O(N)
linear global attention + shallow GCN for transductive node
classification, from 2.7K-node planetoid graphs to 100M-node OGB
graphs — built TPU-first:

- static-shape, jit-compiled train steps (no per-step host work);
- graph structure (degree norm, CSR sort) hoisted out of the hot loop;
- Pallas kernels for the sparse aggregation hot path;
- SPMD scaling via `jax.sharding.Mesh` + shard_map (the linear
  attention reduces to ONE psum of [H,M,D]+[H,M]+scalars per layer);
- a single model definition covering all three reference tiers
  (medium / large / 100M) selected by config.
"""

__version__ = "0.1.0"

from sgformer_tpu.graph import Graph, preprocess_graph  # noqa: F401
from sgformer_tpu.nn.sgformer import SGFormer, SGFormerConfig  # noqa: F401
from sgformer_tpu.serve import (  # noqa: F401
    Predictor,
    load_exported,
    load_predictor,
)
