"""SPMD scaling layer: mesh helpers, the host-side graph partitioner, and
shard_map-based sharded training steps.

Design (SURVEY.md §2.5/§5): the reference is strictly single-GPU; scaling
here is native. Nodes are sharded in contiguous blocks over a mesh axis
("sp"): the linear attention needs exactly ONE psum of its
[H,M,D]+[H,M]+3-scalar partial sums per layer, the GCN branch exchanges
cross-shard source features (all_gather of the activation matrix), and
BatchNorm statistics are psum'd.  Gradients of the replicated parameters
are psum'd once per step.
"""

from sgformer_tpu.parallel.mesh import (  # noqa: F401
    feed_process_local,
    init_distributed,
    make_global_mesh,
    make_mesh,
)
from sgformer_tpu.parallel.partition import (  # noqa: F401
    ShardGraph,
    partition_graph,
    pad_to_shards,
)
from sgformer_tpu.parallel.sharded import ShardedTrainer, make_sharded_steps  # noqa: F401
from sgformer_tpu.parallel.dp_trainer import DPBatchTrainer  # noqa: F401
