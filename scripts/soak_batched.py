"""Batched-mode steady-state step timing (the main-batch.py path) on the
real chip: 200K nodes, batch 20K, pallas chunk plans, 2 epochs + eval.

Round-2b re-measure: the chunk kernel gained bf16 outputs and dropout
gained u8 draws since the round-2 soak (3 epochs in 260 s incl. compiles).
Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np


def main():
    import jax

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.batch_trainer import (BatchTrainConfig,
                                                  BatchTrainer)

    N, E = 200_000, 1_600_000
    t0 = time.time()
    ds = synthetic_dataset(num_nodes=N, num_edges=E, num_features=64,
                           num_classes=10, seed=0)
    print(f"synth: {time.time()-t0:.1f}s", flush=True)

    cfg = SGFormerConfig.large(256, 10, trans_num_layers=1,
                               gnn_num_layers=3, graph_weight=0.5,
                               compute_dtype="bf16")
    tc = BatchTrainConfig(lr=1e-3, trans_weight_decay=0.0,
                          gnn_weight_decay=0.0, epochs=2, eval_step=1,
                          batch_size=20_000, use_pallas=True,
                          eval_mode="batch", display_step=-1)
    trainer = BatchTrainer(SGFormer(cfg), ds.graph["edge_index"],
                           ds.graph["node_feat"], ds.label, tc)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    t0 = time.time()
    logger = trainer.fit([split])
    total = time.time() - t0
    n_steps = tc.epochs * (N // tc.batch_size)
    print(f"fit: {total:.1f}s total incl. compiles "
          f"({tc.epochs} epochs, {n_steps} train steps + streaming eval)",
          flush=True)
    s = logger.run_summary(0)
    print(f"final_test={s['final_test']:.3f}", flush=True)

    # steady-state per-step (warm): one more epoch timed alone
    tc2 = BatchTrainConfig(lr=1e-3, trans_weight_decay=0.0,
                           gnn_weight_decay=0.0, epochs=1, eval_step=10,
                           batch_size=20_000, use_pallas=True,
                           eval_mode="batch", display_step=-1)
    trainer2 = BatchTrainer(SGFormer(cfg), ds.graph["edge_index"],
                            ds.graph["node_feat"], ds.label, tc2)
    trainer2.fit([split])  # compile warm-up via cache
    t0 = time.time()
    trainer2.fit([split])
    dt = time.time() - t0
    steps = N // tc2.batch_size
    print(f"steady epoch: {dt:.2f}s ({dt/steps*1e3:.1f} ms/step incl. "
          f"host partition + 1 streaming eval)", flush=True)


if __name__ == "__main__":
    main()
