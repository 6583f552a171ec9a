from sgformer_tpu.ops.attention import linear_attention  # noqa: F401
from sgformer_tpu.ops.spmm import spmm  # noqa: F401
