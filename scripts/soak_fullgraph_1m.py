"""1M-node FULL-GRAPH soak: proves the scan-streamed chunk plans compile
in practical time at the scale the round-1 attempt could not (>30 min,
killed — the concatenate-of-segments streaming compiled one pallas_call
per segment; the restacked ``ChunkPlan.stream_shape`` form traces the
kernel ONCE inside a ``lax.scan``).

Reports host preprocessing time, train-step compile wall-time, and the
steady-state step time.  Run alone (ONE TPU process):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/soak_fullgraph_1m.py
"""

import time

import numpy as np


def main():
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

    N, E, F = 1_000_000, 8_000_000, 128
    t0 = time.time()
    ds = synthetic_dataset(num_nodes=N, num_edges=E, num_features=F,
                           num_classes=40, seed=0)
    print(f"synth: {time.time()-t0:.0f}s", flush=True)

    import sys

    q8 = "--q8" in sys.argv
    t0 = time.time()
    graph = preprocess_graph(
        ds.graph["edge_index"], N, with_chunks=True, spmm_mode="ssel",
        slab_rows=(49152 if q8 else 24576),
        slab_geometry=({"slab_dtype": "int8"} if q8 else None),
    )
    rem = getattr(graph.chunks.fwd, "remote", None)
    if rem is not None:
        print(f"remote plan stream_shape: {rem.stream_shape}", flush=True)
    print(f"preprocess(ssel): {time.time()-t0:.0f}s", flush=True)

    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1, gnn_num_layers=3,
                               graph_weight=0.5, compute_dtype="bf16")
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    trainer = Trainer(SGFormer(cfg), graph, ds.graph["node_feat"],
                      ds.label, tc)
    rng = train_key(0)
    t0 = time.time()
    state, tx, opt_state = trainer.init_state(rng)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    print(f"init: {time.time()-t0:.0f}s", flush=True)

    train_step, _ = trainer._build_steps(tx)
    train_idx = jnp.asarray(np.arange(0, N, 2, dtype=np.int32))
    t0 = time.time()
    state, opt_state, loss = train_step(state, opt_state, rng, train_idx)
    jax.block_until_ready(loss)
    print(f"COMPILE + first step: {time.time()-t0:.0f}s  loss={float(loss):.3f}",
          flush=True)

    t0 = time.time()
    k = 5
    for _ in range(k):
        state, opt_state, loss = train_step(state, opt_state, rng, train_idx)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / k
    edges = graph.num_edges
    print(f"steady step: {dt*1e3:.1f} ms  ({edges/dt/1e6:.1f} M edges/s)",
          flush=True)
    assert np.isfinite(float(loss))
    print("FULL-GRAPH 1M SOAK OK", flush=True)


if __name__ == "__main__":
    main()
