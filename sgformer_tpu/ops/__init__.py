from sgformer_tpu.ops.attention import linear_attention  # noqa: F401
from sgformer_tpu.ops.spmm import edge_softmax, segment_mean, spmm  # noqa: F401
from sgformer_tpu.ops.sddmm import sddmm, sddmm_softmax_weights  # noqa: F401
