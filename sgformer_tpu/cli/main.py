"""CLI entry point — the TPU equivalent of the reference's three
``main*.py`` scripts (``/root/reference/large/main.py``,
``large/main-batch.py``, ``100M/nb-sample.py``, ``medium/main.py``),
collapsed into one trainer-mode switch:

    python -m sgformer_tpu.cli.main --dataset synth-n20000 --method sgformer \
        --trainer full --hidden_channels 64 --epochs 100

Trainer modes: ``full`` (full-graph, one chip), ``sharded`` (full-graph
SPMD over a node-sharded mesh), ``batch`` (random-partition mini-batch,
``main-batch.py`` semantics), ``sampled`` (neighbor-sampled,
``nb-sample.py`` semantics).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from sgformer_tpu.cli.parse import parse_method, parser_add_main_args
from sgformer_tpu.data import load_dataset
from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.train import (
    BatchTrainConfig,
    BatchTrainer,
    SampledTrainConfig,
    SampledTrainer,
    TrainConfig,
    Trainer,
)

# Datasets the reference keeps directed (large/main.py:74-76 skips
# to_undirected for deezer-europe/ogbn-proteins; directed heterophily sets)
DIRECTED = {"deezer-europe", "ogbn-proteins", "arxiv-year", "snap-patents"}
BCE_DATASETS = {"deezer-europe", "ogbn-proteins", "twitch-e", "fb100", "yelp-chi"}


def get_splits(ds, args) -> list:
    rng = np.random.default_rng(args.seed)
    if args.rand_split_class:
        from sgformer_tpu.data.splits import class_rand_splits

        return [
            class_rand_splits(
                ds.label, args.label_num_per_class,
                valid_num=args.valid_num, test_num=args.test_num, rng=rng,
            )
            for _ in range(args.runs)
        ]
    if args.rand_split or ds.load_fixed_splits is None:
        return [
            ds.get_idx_split("random", train_prop=args.train_prop,
                             valid_prop=args.valid_prop, rng=rng)
            for _ in range(args.runs)
        ]
    # fixed splits: rotate through the committed masks per run (the
    # geom-gcn/heterophilous 10-mask protocol, large/main.py:107-112)
    try:
        return [ds.load_fixed_splits(i) for i in range(args.runs)]
    except TypeError:
        splits = ds.load_fixed_splits()
        return splits if isinstance(splits, list) else [splits]


def main(argv=None):
    parser = argparse.ArgumentParser("sgformer-tpu")
    parser_add_main_args(parser)
    args = parser.parse_args(argv)

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    ds = load_dataset(args.data_dir, args.dataset, args.sub_dataset)
    if args.dataset in ("cora", "citeseer", "pubmed") and not args.no_feat_norm:
        from sgformer_tpu.data.transforms import normalize_features

        ds.graph["node_feat"] = normalize_features(ds.graph["node_feat"])
    n = ds.num_nodes
    c = ds.num_classes
    x = ds.graph["node_feat"]
    d = x.shape[1]
    undirected = not (args.no_undirected or args.dataset in DIRECTED)
    loss = "bce" if args.dataset in BCE_DATASETS else "nll"
    metric = (
        "rocauc"
        if args.dataset in ("ogbn-proteins", "twitch-e", "yelp-chi")
        and args.metric == "acc"
        else args.metric
    )

    model = parse_method(args, n, c, d)
    splits = get_splits(ds, args)
    common = dict(
        lr=args.lr,
        trans_weight_decay=(
            args.trans_weight_decay
            if args.method in ("sgformer", "ours")
            else args.weight_decay
        ),
        gnn_weight_decay=(
            args.gnn_weight_decay
            if args.method in ("sgformer", "ours")
            else args.weight_decay
        ),
        epochs=args.epochs,
        eval_step=args.eval_step,
        patience=args.patience,
        metric=metric,
        mode=args.model_selection,
        loss=loss,
        runs=args.runs,
        seed=args.seed,
        display_step=args.display_step,
    )
    if args.trainer in ("full", "sharded"):
        common["lamda"] = args.lamda
    needs_pyg = args.method in (
        "gcn", "gcnjk", "graphtrans", "graphgps"
    ) or (args.method in ("sgformer", "ours") and args.backbone == "gcn")

    if args.trainer in ("full", "sharded"):
        import jax

        geo = {}
        if args.hub_rows:
            geo["hub_rows"] = args.hub_rows
        if getattr(args, "slab_int8", False):
            geo["slab_dtype"] = "int8"
        elif getattr(args, "slab_dtype", None):
            # 'bf16' forces the compute-dtype slab (auto opt-out)
            geo["slab_dtype"] = (
                "compute" if args.slab_dtype == "bf16" else args.slab_dtype
            )
        graph = preprocess_graph(
            ds.graph["edge_index"], n, undirected=undirected,
            with_pyg_norm=needs_pyg, with_chunks=args.use_pallas,
            chunk_dtype=args.chunk_dtype, spmm_mode=args.spmm_mode,
            slab_rows=(49152 if getattr(args, "slab_int8", False) else 24576),
            slab_geometry=geo or None,
            chunk_interpret=jax.default_backend() not in ("tpu",),
        )
        model_kwargs = {}
        if args.method == "h2gcn":
            from sgformer_tpu.graph import build_h2_graphs

            model_kwargs["h2_graphs"] = build_h2_graphs(
                ds.graph["edge_index"], n
            )
        elif args.method == "nodeformer":
            from sgformer_tpu.nn import build_nodeformer_adjs

            model_kwargs["adjs"] = build_nodeformer_adjs(
                ds.graph["edge_index"], n, rb_order=2
            )
        elif args.method == "graphormer":
            from sgformer_tpu.nn import graphormer_inputs

            model_kwargs["inputs"] = graphormer_inputs(
                ds.graph["edge_index"], (x > 0).astype(np.int64), n
            )
        if args.trainer == "sharded":
            from sgformer_tpu.parallel.sharded import ShardedTrainer

            trainer = ShardedTrainer(
                model, graph, x, ds.label, TrainConfig(**common),
                use_pallas=args.use_pallas, use_halo=args.use_halo,
                chunk_dtype=args.chunk_dtype,
            )
        else:
            trainer = Trainer(
                model, graph, x, ds.label, TrainConfig(**common),
                model_kwargs=model_kwargs,
            )
    elif args.trainer == "batch":
        from sgformer_tpu.graph import (
            add_self_loops,
            remove_self_loops,
            to_undirected,
        )

        e = ds.graph["edge_index"]
        if undirected:
            e = to_undirected(e)
        e = add_self_loops(remove_self_loops(e), n)
        full_graph = preprocess_graph(
            ds.graph["edge_index"], n, undirected=undirected,
            with_pyg_norm=needs_pyg,
        )
        trainer = BatchTrainer(
            model, e, x, ds.label,
            BatchTrainConfig(**common, batch_size=args.batch_size,
                             use_pallas=args.use_pallas),
            full_graph=full_graph, with_pyg_norm=needs_pyg,
        )
    elif args.trainer == "sampled":
        from sgformer_tpu.graph import (
            add_self_loops,
            remove_self_loops,
            to_undirected,
        )

        e = ds.graph["edge_index"]
        if undirected:
            e = to_undirected(e)
        e = add_self_loops(remove_self_loops(e), n)
        trainer = SampledTrainer(
            model, e, x, ds.label,
            SampledTrainConfig(
                **common,
                batch_size=args.batch_size,
                fanouts=tuple(args.fanouts),
                save_model=args.save_model,
                use_pretrained=args.use_pretrained,
                model_dir=args.model_dir,
                eval_train=getattr(args, "eval_train", False),
                transfer_dtype=getattr(args, "transfer_dtype", "auto"),
                sampler_workers=getattr(args, "sampler_workers", 0),
            ),
        )
    else:
        raise ValueError(args.trainer)

    if args.time_test:
        # medium/time_test.py semantics: timed epochs, fwd latency, memory
        from sgformer_tpu.train.timing import time_test

        assert args.trainer in ("full", "sharded"), "time_test: full-graph"
        res = time_test(trainer, splits[0], epochs=args.epochs,
                        trace_dir=args.trace_dir)
        import json

        print(json.dumps(res.as_dict()))
        return res

    logger = trainer.fit(splits)
    stats = logger.print_statistics()

    if args.save_attn:
        # materialized [L, N, N] maps (SGFormer.get_attentions /
        # DIFFormer.get_attentions); O(N^2) -> small graphs only
        import jax

        state = trainer.final_state
        attn = jax.jit(
            lambda v, xx: trainer.model.apply(v, xx, method="get_attentions")
        )(
            {"params": state["params"],
             "batch_stats": state.get("batch_stats", {})},
            trainer.x,
        )
        os.makedirs(args.attn_dir, exist_ok=True)
        attn_path = os.path.join(
            args.attn_dir, f"{args.dataset}_{args.method}_attn.npy"
        )
        np.save(attn_path, np.asarray(attn))
        print(f"attention maps -> {attn_path}")

    if args.save_result and stats:
        os.makedirs(args.result_dir, exist_ok=True)
        name = f"{args.dataset}_{args.method}"
        if args.method in ("sgformer", "ours"):
            name += f"_{args.backbone}"
        path = os.path.join(args.result_dir, name + ".txt")
        with open(path, "a") as f:
            mean, std = stats["final_test"]
            f.write(
                f"runs={args.runs} lr={args.lr} hidden={args.hidden_channels} "
                f"epochs={args.epochs} test_acc={mean:.2f}±{std:.2f}\n"
            )
    return logger


if __name__ == "__main__":
    main()
