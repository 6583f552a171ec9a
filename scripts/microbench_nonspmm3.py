"""Round-2c step ablations at the shipped 61.6 ms config.

Step-level (fused 10-step lax.scan blocks, state threaded through every
call so the relay memoizer can't fire) costs of:

  A. baseline full ssel train step (bench.py config)
  B. dropout = 0 everywhere        -> total dropout residual
  C. use_bn = False everywhere     -> BatchNorm fwd+bwd share
  D. gnn = 'none'                  -> attention branch + head alone
  E. B + C                         -> combined elementwise floor

Run alone (ONE TPU process): PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np

K = 10


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
    t0 = time.time()
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel")
    print(f"preprocess: {time.time()-t0:.0f}s", flush=True)
    train_idx_np = np.arange(0, N, 2, dtype=np.int32)
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)

    def run(label, **cfg_kw):
        cfg = SGFormerConfig.large(
            256, 40, trans_num_layers=1, gnn_num_layers=3, graph_weight=0.5,
            compute_dtype="bf16", **cfg_kw,
        )
        model = SGFormer(cfg)
        trainer = Trainer(model, graph, ds.graph["node_feat"], ds.label, tc)
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
        print(f"{label:45s} {best:7.2f} ms/step", flush=True)
        return best

    a = run("A baseline (bench.py config)")
    b = run("B dropout=0", trans_dropout=0.0, gnn_dropout=0.0)
    c = run("C no BN", trans_use_bn=False, gnn_use_bn=False)
    d = run("D attention branch only (gnn='none')", gnn="none")
    e = run("E dropout=0 + no BN", trans_dropout=0.0, gnn_dropout=0.0,
            trans_use_bn=False, gnn_use_bn=False)
    print(f"\ndropout residual: {a-b:.2f} ms | BN share: {a-c:.2f} ms | "
          f"GCN branch+its share: {a-d:.2f} ms | combined: {a-e:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
