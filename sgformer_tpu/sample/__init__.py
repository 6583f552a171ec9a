from sgformer_tpu.sample.neighbor import (  # noqa: F401
    CSRGraph,
    NeighborSampler,
    PrefetchIterator,
    SampledBatch,
)
