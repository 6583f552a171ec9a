from sgformer_tpu.nn.layers import TorchLinear  # noqa: F401
from sgformer_tpu.nn.norm import MaskedBatchNorm  # noqa: F401
from sgformer_tpu.nn.transconv import TransConv, TransConvLayer  # noqa: F401
from sgformer_tpu.nn.graphconv import GraphConv, GraphConvLayer  # noqa: F401
from sgformer_tpu.nn.gcn import GCN, GCNConv  # noqa: F401
from sgformer_tpu.nn.sgformer import SGFormer, SGFormerConfig  # noqa: F401
from sgformer_tpu.nn.difformer import DIFFormer, DIFFormerConv  # noqa: F401
from sgformer_tpu.nn.nodeformer import (  # noqa: F401
    NodeFormer,
    NodeFormerConv,
    build_nodeformer_adjs,
)
from sgformer_tpu.nn.graphtrans import GraphTrans  # noqa: F401
from sgformer_tpu.nn.graphormer import (  # noqa: F401
    Graphormer,
    QuantNoiseLinear,
    collate_graphs,
    graphormer_inputs,
)
from sgformer_tpu.nn.graphgps import GraphGPS  # noqa: F401
from sgformer_tpu.nn.baselines import (  # noqa: F401
    APPNP,
    GAT,
    GATJK,
    GCNJK,
    GPRGNN,
    H2GCN,
    LINK,
    MLP,
    SGC,
    SGC2,
    SGCMem,
    SIGN,
    MixHop,
    MultiLP,
)
