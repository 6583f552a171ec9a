"""Serving-path latency: AOT-compiled full-graph inference at arxiv scale.

Measures the `serve.Predictor` forward (bf16 ssel production graph,
published arxiv model shape) on one v5e: per-request latency when every
request carries fresh features (the relay memoizes identical dispatches,
CLAUDE.md — so each timed call perturbs one input row to force real
execution; the perturbation cost itself is inside the compiled program).

Run alone (ONE TPU process):
PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serve.py
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
    from sgformer_tpu.serve import Predictor
    from sgformer_tpu.train.trainer import TrainConfig, Trainer
    from sgformer_tpu.utils.rng import train_key

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel")
    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1,
                               gnn_num_layers=3, graph_weight=0.5,
                               compute_dtype="bf16")
    model = SGFormer(cfg)
    trainer = Trainer(model, graph, ds.graph["node_feat"], ds.label,
                      TrainConfig(lr=1e-3, trans_weight_decay=0.0,
                                  gnn_weight_decay=0.0))
    state, _, _ = trainer.init_state(train_key(0))

    pred = Predictor(model, graph, ds.graph["node_feat"],
                     {"params": state["params"],
                      "batch_stats": state["batch_stats"]})
    t0 = time.time()
    pred.compile()
    print(f"AOT compile: {time.time()-t0:.1f}s", flush=True)

    # per-request timing with fresh inputs each call: x[0, salt-col] += eps
    # (executed on device inside one jitted wrapper so the host cost is a
    # single scalar transfer)
    @jax.jit
    def salted(params, bs, x, graph, salt):
        x = x.at[0, 0].add(salt * 1e-6)
        out = pred._fwd(params, bs, x, graph)
        return out

    p, bs = pred.state["params"], pred.state["batch_stats"]
    out = salted(p, bs, pred.x, pred.graph, jnp.float32(0.0))
    np.asarray(out)  # sync (value fetch — block_until_ready may not relay)

    # device throughput: K salted forwards inside ONE jitted fori_loop
    # (bench.py protocol — data dependency through the carry defeats the
    # relay's memoization; one dispatch, one value-fetch sync)
    K = 20

    @jax.jit
    def k_requests(p, bs, x, graph, salt0):
        def body(i, carry):
            o = salted(p, bs, x, graph, salt0 + i.astype(jnp.float32))
            return carry + o[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    float(k_requests(p, bs, pred.x, pred.graph, jnp.float32(1.0)))  # warm
    t0 = time.perf_counter()
    float(k_requests(p, bs, pred.x, pred.graph, jnp.float32(50.0)))
    dt = (time.perf_counter() - t0) / K
    print(f"serving forward (fresh input per request, fused x{K}): "
          f"{dt*1e3:.2f} ms/request = "
          f"{N/dt:,.0f} node-classifications/s", flush=True)

    # strict request-response (sync each call).  Through THIS
    # environment's tunnel the number is RTT-plumbing-dominated and
    # unstable (48-220 ms/request across sessions for the same 23.8 ms
    # on-device forward); it bounds what the relay adds, not what a
    # colocated deployment would see.
    t0 = time.perf_counter()
    for i in range(5):
        o = salted(p, bs, pred.x, pred.graph, jnp.float32(100.0 + i))
        float(o[0, 0])
    dt = (time.perf_counter() - t0) / 5
    print(f"strict sync request-response: {dt*1e3:.2f} ms/request "
          "(tunnel-RTT dominated; see comment)", flush=True)


if __name__ == "__main__":
    main()
