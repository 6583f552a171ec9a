from sgformer_tpu.nn.layers import TorchLinear  # noqa: F401
from sgformer_tpu.nn.transconv import TransConv, TransConvLayer  # noqa: F401
from sgformer_tpu.nn.graphconv import GraphConv, GraphConvLayer  # noqa: F401
from sgformer_tpu.nn.gcn import GCN  # noqa: F401
from sgformer_tpu.nn.sgformer import SGFormer, SGFormerConfig  # noqa: F401
