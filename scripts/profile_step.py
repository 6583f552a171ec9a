"""Capture a jax.profiler device trace of the bench-config train step and
print the per-op time table (xprof / tensorboard_plugin_profile parse).

Answers "where are the remaining non-SpMM milliseconds" with data instead
of ablations.  Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import glob
import os
import sys
import time

import numpy as np

TRACE_DIR = "/tmp/sgformer_trace"


def capture():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.trainer import TrainConfig, Trainer
    from sgformer_tpu.utils.rng import train_key

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel")
    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1, gnn_num_layers=3,
                               graph_weight=0.5, compute_dtype="bf16")
    model = SGFormer(cfg)
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    trainer = Trainer(model, graph, ds.graph["node_feat"], ds.label, tc)
    rng = train_key(0)
    state, tx, opt_state = trainer.init_state(rng)
    train_step, _ = trainer._build_steps(tx)
    train_idx = jnp.asarray(np.arange(0, N, 2, dtype=np.int32))

    for _ in range(3):  # warm compile + cache
        state, opt_state, loss = train_step(state, opt_state, rng, train_idx)
    jax.block_until_ready(loss)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            state, opt_state, loss = train_step(state, opt_state, rng,
                                                train_idx)
        jax.block_until_ready(loss)
    print("trace captured", flush=True)


def parse(n_steps=5):
    """Print a per-op time table from the trace via xprof's hlo_stats tool
    (the op_profile tool returns an empty tree for these traces; hlo_stats
    works)."""
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("NO XPLANE FILES — device tracing not supported here")
        return
    f = max(files, key=os.path.getmtime)
    print(f"parsing {f}", flush=True)
    import collections
    import gzip
    import json
    import re

    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([f], "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    d = json.loads(data)
    cols = [c["label"] for c in d["cols"]]
    i = {c: k for k, c in enumerate(cols)}
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]

    cat = collections.Counter()
    for r in rows:
        cat[r[i["HLO op category"]]] += float(r[i["Total self time (us)"]] or 0)
    tot = sum(cat.values())
    print(f"TOTAL device self time: {tot/1e3:.2f} ms over {n_steps} steps "
          f"-> {tot/(n_steps*1e3):.2f} ms/step")
    for k, v in cat.most_common(15):
        print(f"  {k:40s} {v/(n_steps*1e3):7.3f} ms/step  {v/tot*100:5.1f}%")

    print("\ntop op groups (name with trailing .N stripped):")
    agg, occ, bound = collections.Counter(), collections.Counter(), {}
    for r in rows:
        g = re.sub(r"[.\d]+$", "", r[i["HLO op name"]])
        key = (r[i["HLO op category"]], g)
        agg[key] += float(r[i["Total self time (us)"]] or 0)
        occ[key] += int(r[i["#Occurrences"]] or 0)
        bound[key] = r[i["Bound by"]]
    print(f"  {'category':20s} {'op group':34s} {'ms/step':>8s} {'%':>5s} "
          f"{'occ/step':>8s} {'bound':>10s}")
    for k, v in agg.most_common(25):
        print(f"  {k[0]:20s} {k[1][:34]:34s} {v/(n_steps*1e3):8.3f} "
              f"{v/tot*100:5.1f} {occ[k]/n_steps:8.1f} {str(bound[k]):>10s}")


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        capture()
    parse()
