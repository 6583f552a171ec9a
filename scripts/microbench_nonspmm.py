"""Non-SpMM step fat: RNG impl, split dispatches, dropout upper bound.

Step anatomy (BENCH.md) says ~45 ms of the 103 ms ssel train step is
non-SpMM.  This isolates the suspects on the real chip:

  A. raw dropout-mask generation (7 x bernoulli [N,256]):
     threefry vs rbg keys
  B. full ssel train step:
     1. current bench loop (jax.random.split dispatch per step)
     2. keys presplit in one batch (isolates the relay split dispatch)
     3. presplit rbg keys (isolates in-step threefry bit-gen)
     4. dropout=0.0 config (upper bound of all dropout cost)

Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
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

    N = 169_343
    salt_counter = [0.0]

    def timed(f, *args):
        fj = jax.jit(f)

        def call():
            salt_counter[0] += 1.0
            return float(fj(jnp.float32(salt_counter[0]), *args))

        call()
        t0 = time.perf_counter()
        call()
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        call()
        dt2 = time.perf_counter() - t0
        return min(dt1, dt2) / K * 1e3

    # ---- A: mask generation, 7 masks of [N, 256] per iteration ----
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        def mask_loop(salt, k):
            def body(i, carry):
                k_c, acc = carry
                k_c = jax.random.fold_in(k_c, i)
                tot = salt
                for j in range(7):
                    m = jax.random.bernoulli(
                        jax.random.fold_in(k_c, j), 0.5, (N, 256))
                    tot = tot + jnp.sum(m.astype(jnp.float32))
                return k_c, acc + tot
            return jax.lax.fori_loop(0, K, body, (k, salt))[1]

        ms = timed(mask_loop, key)
        print(f"7x bernoulli [N,256] {impl:12s}: {ms:7.2f} ms/iter",
              flush=True)

    # ---- B: full ssel train step variants ----
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.trainer import TrainConfig, Trainer

    ds = synthetic_dataset(num_nodes=N, num_edges=1_166_243,
                           num_features=128, num_classes=40, seed=0)
    t0 = time.time()
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel")
    print(f"preprocess: {time.time()-t0:.0f}s", flush=True)
    train_idx = jnp.asarray(np.arange(0, N, 2, dtype=np.int32))
    steps = 30

    def run_step_loop(trainer, keys=None, label=""):
        rng = jax.random.PRNGKey(0)
        state, tx, opt_state = trainer.init_state(rng)
        train_step, _ = trainer._build_steps(tx)
        k0 = keys[0] if keys is not None else rng
        state, opt_state, loss = train_step(state, opt_state, k0, train_idx)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(steps):
            if keys is None:
                rng, drop = jax.random.split(rng)
            else:
                drop = keys[i]
            state, opt_state, loss = train_step(state, opt_state, drop,
                                                train_idx)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / steps
        print(f"full step {label:28s}: {dt*1e3:7.2f} ms"
              f" ({graph.num_edges/dt/1e6:.1f} Medges/s)", flush=True)

    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1, gnn_num_layers=3,
                               graph_weight=0.5, compute_dtype="bf16")
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    trainer = Trainer(SGFormer(cfg), graph, ds.graph["node_feat"], ds.label,
                      tc)

    run_step_loop(trainer, None, "split/step (bench.py)")

    keys_tf = jax.device_put(jax.random.split(jax.random.PRNGKey(1), steps))
    jax.block_until_ready(keys_tf)
    run_step_loop(trainer, list(keys_tf), "presplit threefry")

    keys_rbg = jax.device_put(
        jax.random.split(jax.random.key(1, impl="rbg"), steps))
    jax.block_until_ready(keys_rbg)
    run_step_loop(trainer, list(keys_rbg), "presplit rbg")

    cfg0 = SGFormerConfig.large(256, 40, trans_num_layers=1,
                                gnn_num_layers=3, graph_weight=0.5,
                                compute_dtype="bf16", trans_dropout=0.0,
                                gnn_dropout=0.0)
    trainer0 = Trainer(SGFormer(cfg0), graph, ds.graph["node_feat"],
                       ds.label, tc)
    run_step_loop(trainer0, list(keys_tf), "dropout=0 (upper bound)")


if __name__ == "__main__":
    main()
