"""Can the sampled-tier device step use the MXU chunk-plan SpMM?

The sampled train step's propagate runs as XLA gather+segment-sum over
the batch's ~2.4M padded edges × 6 passes — ~107 ms of the measured
147 ms device step at the 10M soak (the row-gather wall, BENCH.md).
The batch trainer already replaces exactly this with per-batch
fixed-shape MXU chunk plans (``build_subgraph_batch(use_pallas=True)``).
This bench asks whether the same trade wins for sampled batches:

  1. host cost of ``build_chunks_fixed`` on a sampled batch's padded
     edge list (prefetch-threadable);
  2. device train-step time, plain Graph vs chunk-plan Graph.

Run alone (ONE TPU process), after soak_sampled_10m.py --build.
"""

import os
import time

import numpy as np

DATA_DIR = os.environ.get("SOAK10M_DIR", "/tmp/sgformer_10m")
C = 64


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from sgformer_tpu.data.feature_store import FeatureStore
    from sgformer_tpu.data.prep import load_csr
    from sgformer_tpu.kernels.chunks import build_chunks_fixed
    from sgformer_tpu.graph import Graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.optim import dual_weight_decay_adam
    from sgformer_tpu.train.sampled_trainer import (SampledTrainConfig,
                                                    SampledTrainer,
                                                    batch_graph)

    label = np.load(os.path.join(DATA_DIR, "labels.npy"))
    store = FeatureStore.from_npy(os.path.join(DATA_DIR, "feat.npy"))
    csr = load_csr(os.path.join(DATA_DIR, "csr"), in_ram=True)

    cfg = SGFormerConfig.papers100m(256, C, compute_dtype="bf16")
    tc = SampledTrainConfig(
        lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0,
        batch_size=1000, fanouts=(15, 10, 5), display_step=-1,
    )
    trainer = SampledTrainer(SGFormer(cfg), csr, store, label, tc)
    seeds_all = np.load(os.path.join(DATA_DIR, "train_idx.npy"))

    K = 12
    batches = [
        trainer.sampler.sample(seeds_all[i * 1000:(i + 1) * 1000])
        for i in range(K)
    ]
    xs = [trainer._gather_x(b.node_ids) for b in batches]

    # 1. host chunk-plan build on the padded edge list
    n_cap = len(batches[0].node_mask)
    e_cap = len(batches[0].edge_src)
    t0 = time.time()
    plans = [
        build_chunks_fixed(
            np.asarray(b.edge_src), np.asarray(b.edge_dst),
            np.asarray(b.edge_weight), n_cap, edge_cap=e_cap,
        )
        for b in batches
    ]
    plan_ms = (time.time() - t0) / K * 1e3
    print(f"host chunk-plan build: {plan_ms:.0f} ms/batch "
          f"({e_cap} edge slots, {n_cap} nodes)", flush=True)

    def graph_for(b, plan=None):
        n = len(b.node_mask)
        return Graph(
            edge_src=jnp.asarray(b.edge_src),
            edge_dst=jnp.asarray(b.edge_dst),
            gcn_weight=jnp.asarray(b.edge_weight),
            indptr=jnp.asarray(np.zeros(n + 1, dtype=np.int64),
                               dtype=jnp.int32),
            num_nodes=int(n), num_edges=int(e_cap),
            chunks=plan, chunk_dtype="bf16",
        )

    # shared state
    warm = batches[0]
    g0 = batch_graph(warm)
    variables = jax.jit(
        lambda r, x, g, nm: trainer.model.init(
            {"params": r}, x, g, train=False, node_mask=nm)
    )(jax.random.PRNGKey(0), jnp.asarray(xs[0]), g0,
      jnp.asarray(warm.node_mask))
    tx = dual_weight_decay_adam(variables["params"], 1e-3, 0.0, 0.0)
    train_step, _ = trainer._steps(tx)

    # pre-stage device inputs so the comparison isolates the step
    staged = []
    for b, x in zip(batches, xs):
        staged.append((
            jax.device_put(x), jnp.asarray(trainer.label[b.node_ids]),
            jnp.asarray(b.node_mask),
            jnp.asarray(float(b.num_seeds), jnp.float32),
        ))
    for name, use_plan in (("xla gather+segsum", False),
                           ("pallas chunk plans", True)):
        state = {
            "params": jax.tree.map(jnp.array, variables["params"]),
            "batch_stats": jax.tree.map(
                jnp.array, variables.get("batch_stats", {})),
        }
        opt_state = tx.init(state["params"])
        rng = jax.random.PRNGKey(1)
        gs = [graph_for(b, plans[i] if use_plan else None)
              for i, b in enumerate(batches)]
        # warm compile
        rng, drop = jax.random.split(rng)
        state, opt_state, loss = train_step(
            state, opt_state, drop, staged[0][0], gs[0], *staged[0][1:])
        _ = float(loss)
        t0 = time.time()
        for (xd, lab, nm, ns), g in zip(staged, gs):
            rng, drop = jax.random.split(rng)
            state, opt_state, loss = train_step(
                state, opt_state, drop, xd, g, lab, nm, ns)
        _ = float(loss)
        ms = (time.time() - t0) / K * 1e3
        print(f"device step [{name}]: {ms:.0f} ms/batch  "
              f"(final loss {float(loss):.4f})", flush=True)


if __name__ == "__main__":
    main()
