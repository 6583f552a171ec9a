"""Pallas TPU kernels for the sparse hot path.

The reference leans on cuSPARSE/torch_sparse CUDA kernels (SURVEY.md §2.4);
these are their TPU-native replacements, designed around the MXU rather
than translated: scatter/gather-style aggregation is reformulated as dense
one-hot matmuls over edge chunks so the accumulation runs on the systolic
array instead of a scalar scatter loop.
"""

from sgformer_tpu.kernels.chunks import ChunkedSpMM, build_chunks  # noqa: F401
from sgformer_tpu.kernels.spmm import chunked_spmm  # noqa: F401
