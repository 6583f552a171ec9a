"""Round-2c geometry sweep with the int8 0/1 dst selector stream.

rs[dst] hoisted out of sel_dst means the dst stream is int8 in every ssel
mode (-33% selector stream bytes at the shipped geometry).  W=256 variants
become interesting: (window, sub) groups double in size -> better C-chunk
fill and half the grid steps, at +W x F MACs/slot on the dst matmul.

Step-level decision metric (full train step, fused 10-step scan blocks).
Run alone (ONE TPU process): PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np

K = 10

GEOMS = [
    ("W128 C16 Q128 R24K (shipped, now i8 dst)", {}),
    ("W256 C16 Q128 R24K", {"window_rows": 256}),
    ("W256 C32 Q64 R24K", {"window_rows": 256, "chunk_edges": 32,
                           "chunks_per_step": 64}),
]


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

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    train_idx_np = np.arange(0, N, 2, dtype=np.int32)
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    cfg = SGFormerConfig.large(
        256, 40, trans_num_layers=1, gnn_num_layers=3, graph_weight=0.5,
        compute_dtype="bf16",
    )
    model = SGFormer(cfg)

    for label, geo in GEOMS:
        t0 = time.time()
        try:
            graph = preprocess_graph(ds.graph["edge_index"], N,
                                     with_chunks=True, spmm_mode="ssel",
                                     slab_geometry=geo)
        except Exception as e:  # plan-build failure: report, keep sweeping
            print(f"{label:45s} PLAN FAIL: {e}", flush=True)
            continue
        pre = time.time() - t0
        try:
            trainer = Trainer(model, graph, ds.graph["node_feat"],
                              ds.label, tc)
            rng = train_key(0)
            state, tx, opt_state = trainer.init_state(rng)
            train_idx = jnp.asarray(trainer._map_idx(train_idx_np))
            multi = trainer._build_multi_step(tx, K)
            state, opt_state, rng, losses = multi(state, opt_state, rng,
                                                  train_idx)
            jax.block_until_ready(losses)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                state, opt_state, rng, losses = multi(state, opt_state, rng,
                                                      train_idx)
                jax.block_until_ready(losses)
                best = min(best, (time.perf_counter() - t0) / K * 1e3)
            side = graph.chunks.fwd
            print(f"{label:45s} {best:7.2f} ms/step  "
                  f"(n_steps={side.n_steps}, plan {pre:.0f}s)", flush=True)
        except Exception as e:
            print(f"{label:45s} COMPILE/RUN FAIL: "
                  f"{str(e)[:200]}", flush=True)
        del graph


if __name__ == "__main__":
    main()
