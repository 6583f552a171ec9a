"""Non-SpMM ablations round 2b: BatchNorm share, loss-gather variant.

Step-level (salted state-threading loop) costs of:
  A. baseline full ssel train step (sep int8 selectors)
  B. use_bn=False              -> BatchNorm fwd+bwd share
  C. masked loss               -> logits[idx] row-gather vs full-N mask
  D. B + C

Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
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
    from sgformer_tpu.train import trainer as trainer_mod
    from sgformer_tpu.train.trainer import TrainConfig, Trainer
    from sgformer_tpu.utils.rng import train_key

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    t0 = time.time()
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel")
    print(f"preprocess: {time.time()-t0:.0f}s "
          f"(sep={graph.chunks.pre_scale is not None})", flush=True)
    train_idx = jnp.asarray(np.arange(0, N, 2, dtype=np.int32))
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)

    def run(label, use_bn=True, masked_loss=False):
        if masked_loss:
            orig = trainer_mod.cross_entropy_loss
            n_train = int(train_idx.shape[0])

            def masked_ce(logits, labels, idx):
                mask = jnp.zeros((logits.shape[0],), jnp.float32)
                mask = mask.at[idx].set(1.0)
                logp = jax.nn.log_softmax(logits)
                onehot = jax.nn.one_hot(labels, logits.shape[1],
                                        dtype=logp.dtype)
                nll = -jnp.sum(logp * onehot, axis=1)
                return jnp.sum(nll * mask) / n_train

            trainer_mod.cross_entropy_loss = masked_ce
        try:
            cfg = SGFormerConfig.large(
                256, 40, trans_num_layers=1, gnn_num_layers=3,
                graph_weight=0.5, compute_dtype="bf16",
                gnn_use_bn=use_bn, trans_use_bn=use_bn,
            )
            trainer = Trainer(SGFormer(cfg), graph, ds.graph["node_feat"],
                              ds.label, tc)
            rng = train_key(0)
            state, tx, opt_state = trainer.init_state(rng)
            k = 10
            multi = trainer._build_multi_step(tx, k)
            state, opt_state, rng, losses = multi(state, opt_state, rng,
                                                  train_idx)
            jax.block_until_ready(losses)
            t0 = time.perf_counter()
            blocks = 3
            for _ in range(blocks):
                state, opt_state, rng, losses = multi(state, opt_state, rng,
                                                      train_idx)
            jax.block_until_ready(losses)
            dt = (time.perf_counter() - t0) / (k * blocks)
            print(f"{label:28s}: {dt*1e3:7.2f} ms "
                  f"({graph.num_edges/dt/1e6:.1f} Medges/s)", flush=True)
        finally:
            if masked_loss:
                trainer_mod.cross_entropy_loss = orig

    run("A baseline")
    run("B use_bn=False", use_bn=False)
    run("C masked loss", masked_loss=True)
    run("D bn off + masked loss", use_bn=False, masked_loss=True)


if __name__ == "__main__":
    main()
