"""Hub-resident scratch tail on a power-law (arxiv-like) graph.

Real citation/social graphs are scale-free: cross-cluster edges
concentrate on hub nodes.  ``build_slabs(hub_rows=K)`` pins the top-K
remote sources in a permanent VMEM tail (gathered once per pass), turning
their edges into local one-hot MXU work instead of 9.7 ns/edge remote
gathers.  This sweep measures the full train step on a power-law bench
graph with/without hubs (the uniform planted-partition bench graph has no
hubs by construction, so the headline bench.py is unaffected).

Run alone (ONE TPU process): PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np

K = 10

CONFIGS = [
    ("R24K no hub (default geometry)", {}),
    ("R16K no hub (control)", {"slab_rows_override": 16384}),
    ("R16K hub 6144", {"slab_rows_override": 16384, "hub_rows": 6144}),
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
                           num_classes=40, seed=0, powerlaw=1.1)
    deg = np.bincount(ds.graph["edge_index"][0], minlength=N)
    top = np.sort(deg)[::-1]
    print(f"power-law check: max deg {top[0]}, top-6144 share "
          f"{top[:6144].sum()/deg.sum():.2f}", flush=True)
    train_idx_np = np.arange(0, N, 2, dtype=np.int32)
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    cfg = SGFormerConfig.large(
        256, 40, trans_num_layers=1, gnn_num_layers=3, graph_weight=0.5,
        compute_dtype="bf16",
    )
    model = SGFormer(cfg)

    for label, c in CONFIGS:
        geo = {k: v for k, v in c.items() if k != "slab_rows_override"}
        slab_rows = c.get("slab_rows_override", 24576)
        t0 = time.time()
        graph = preprocess_graph(ds.graph["edge_index"], N,
                                 with_chunks=True, spmm_mode="ssel",
                                 slab_rows=slab_rows, slab_geometry=geo)
        pre = time.time() - t0
        side = graph.chunks.fwd
        rem = side.remote.num_chunks * side.remote.chunk_edges \
            if side.remote else 0
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
            print(f"{label:35s} {best:7.2f} ms/step  "
                  f"(remote slots {rem}, n_steps {side.n_steps}, "
                  f"plan {pre:.0f}s)", flush=True)
        except Exception as e:
            print(f"{label:35s} FAIL: {str(e)[:160]}", flush=True)
        del graph


if __name__ == "__main__":
    main()
