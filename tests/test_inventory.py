"""Living parity checklist: every SURVEY.md §2 component the reference
exposes must exist in this framework's public API (the judge's inventory,
PARITY.md, machine-checked)."""

import importlib

import pytest


COMPONENTS = [
    # §2.1 core model
    ("sgformer_tpu.ops.attention", "linear_attention"),
    ("sgformer_tpu.nn", "TransConvLayer"),
    ("sgformer_tpu.nn", "TransConv"),
    ("sgformer_tpu.nn", "GraphConvLayer"),
    ("sgformer_tpu.nn", "GraphConv"),
    ("sgformer_tpu.nn", "GCN"),
    ("sgformer_tpu.nn", "GCNConv"),
    ("sgformer_tpu.nn", "SGFormer"),
    ("sgformer_tpu.nn", "SGFormerConfig"),
    ("sgformer_tpu.ops.attention_variants", "softmax_attention"),
    ("sgformer_tpu.ops.attention_variants", "gat_attention"),
    ("sgformer_tpu.ops.attention_variants", "performer_attention"),
    # §2.2 baseline zoo
    ("sgformer_tpu.nn", "MLP"),
    ("sgformer_tpu.nn", "LINK"),
    ("sgformer_tpu.nn", "SGC"),
    ("sgformer_tpu.nn", "SGCMem"),
    ("sgformer_tpu.nn", "SGC2"),
    ("sgformer_tpu.nn", "SIGN"),
    ("sgformer_tpu.nn", "GAT"),
    ("sgformer_tpu.nn", "MixHop"),
    ("sgformer_tpu.nn", "GCNJK"),
    ("sgformer_tpu.nn", "GATJK"),
    ("sgformer_tpu.nn", "APPNP"),
    ("sgformer_tpu.nn", "GPRGNN"),
    ("sgformer_tpu.nn", "H2GCN"),
    ("sgformer_tpu.nn", "MultiLP"),
    ("sgformer_tpu.nn", "NodeFormer"),
    ("sgformer_tpu.nn", "DIFFormer"),
    ("sgformer_tpu.nn", "GraphGPS"),
    ("sgformer_tpu.nn", "GraphTrans"),
    ("sgformer_tpu.nn", "Graphormer"),
    ("sgformer_tpu.nn", "QuantNoiseLinear"),
    ("sgformer_tpu.nn", "collate_graphs"),
    # §2.3 data / splits / metrics / logging
    ("sgformer_tpu.data", "NCDataset"),
    ("sgformer_tpu.data", "load_dataset"),
    ("sgformer_tpu.data", "FeatureStore"),
    ("sgformer_tpu.data.splits", "rand_train_test_idx"),
    ("sgformer_tpu.data.splits", "class_rand_splits"),
    ("sgformer_tpu.data.splits", "even_quantile_labels"),
    ("sgformer_tpu.data.metrics", "eval_acc"),
    ("sgformer_tpu.data.metrics", "eval_rocauc"),
    ("sgformer_tpu.data.metrics", "eval_f1"),
    ("sgformer_tpu.data.metrics", "count_correct"),
    ("sgformer_tpu.data.transforms", "normalize_features"),
    ("sgformer_tpu.data.transforms", "compute_sgc_features"),
    ("sgformer_tpu.data.transforms", "augment_node_features"),
    ("sgformer_tpu.data.transforms", "gen_normalized_adjs"),
    ("sgformer_tpu.data.transforms", "adj_mul"),
    ("sgformer_tpu.data.transforms", "convert_to_adj"),
    ("sgformer_tpu.data.loaders", "load_fb100"),
    ("sgformer_tpu.data.loaders", "load_twitch"),
    ("sgformer_tpu.data.loaders", "load_geom_gcn"),
    ("sgformer_tpu.data.prep", "build_undirected_csr"),
    ("sgformer_tpu.data.prep", "load_csr"),
    ("sgformer_tpu.train", "RunLogger"),
    # §2.4 native equivalents
    ("sgformer_tpu.kernels", "chunked_spmm"),
    ("sgformer_tpu.kernels.spmm", "chunked_spmm_edge_values"),
    ("sgformer_tpu.kernels.attention", "fused_linear_attention"),
    ("sgformer_tpu.ops", "spmm"),
    ("sgformer_tpu.ops", "segment_mean"),
    ("sgformer_tpu.ops", "edge_softmax"),
    ("sgformer_tpu.ops", "sddmm"),
    ("sgformer_tpu.graph", "subgraph"),
    ("sgformer_tpu.graph", "build_h2_graphs"),
    ("sgformer_tpu.graph", "pyg_gcn_norm"),
    ("sgformer_tpu.sample", "NeighborSampler"),
    ("sgformer_tpu.sample", "PrefetchIterator"),
    ("sgformer_tpu.native", "native_available"),
    ("sgformer_tpu.utils", "device_memory_stats"),
    # §2.5 parallelism (native here)
    ("sgformer_tpu.parallel", "make_mesh"),
    ("sgformer_tpu.parallel", "make_global_mesh"),
    ("sgformer_tpu.parallel", "init_distributed"),
    ("sgformer_tpu.parallel", "feed_process_local"),
    ("sgformer_tpu.parallel", "partition_graph"),
    ("sgformer_tpu.parallel", "ShardedTrainer"),
    ("sgformer_tpu.parallel.dp_batch", "make_dp_sp_train_step"),
    ("sgformer_tpu.parallel", "DPBatchTrainer"),
    ("sgformer_tpu.parallel.scaling", "measure"),
    # §2.6 + trainers + aux
    ("sgformer_tpu.cli.parse", "parse_method"),
    ("sgformer_tpu.cli.parse", "parser_add_main_args"),
    ("sgformer_tpu.cli.main", "main"),
    ("sgformer_tpu.train", "Trainer"),
    ("sgformer_tpu.train", "BatchTrainer"),
    ("sgformer_tpu.train", "SampledTrainer"),
    ("sgformer_tpu.train", "save_checkpoint"),
    ("sgformer_tpu.train", "load_checkpoint"),
    ("sgformer_tpu.train.timing", "time_test"),
]


@pytest.mark.parametrize("module,name", COMPONENTS,
                         ids=[f"{m}.{n}" for m, n in COMPONENTS])
def test_component_exists(module, name):
    mod = importlib.import_module(module)
    assert hasattr(mod, name), f"{module}.{name} missing"
