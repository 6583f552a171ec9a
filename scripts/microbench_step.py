"""Quiet-host breakdown of the bench.py train step + gather baselines.

Times each piece of the arxiv-shaped SGFormer step separately (salted
dispatches, K-iteration on-device loops) so round-2 optimization targets
the real costs.  Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
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

    N, E_dir = 169_343, 1_166_243
    rng = np.random.default_rng(0)

    # ---- XLA gather quiet baseline ----
    E = 2_500_000
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    xb = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)

    def take_loop(salt, x, idx):
        def body(i, carry):
            idx_c, acc = carry
            out = jnp.take(x, idx_c, axis=0)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            idx_c = jnp.where(probe > 1e30, idx_c ^ 1, idx_c)
            return idx_c, acc + probe
        return jax.lax.fori_loop(0, K, body, (idx, salt))[1]

    ms = timed(take_loop, xb, idx)
    print(f"XLA take 2.5M rows bf16 F=256 (+sum): {ms:7.2f} ms"
          f" ({E/ms/1e3:.1f} Mrows/s)", flush=True)

    # gather WITHOUT the sum consumer: write gathered rows out
    def take_loop2(salt, x, idx):
        def body(i, carry):
            idx_c, acc = carry
            out = jnp.take(x, idx_c, axis=0)
            probe = out[0, 0].astype(jnp.float32) + jnp.sum(
                out[-8:].astype(jnp.float32)) + salt
            idx_c = jnp.where(probe > 1e30, idx_c ^ 1, idx_c)
            return idx_c, acc + probe
        return jax.lax.fori_loop(0, K, body, (idx, salt))[1]

    ms = timed(take_loop2, xb, idx)
    print(f"XLA take 2.5M rows bf16 F=256 (tail-probe): {ms:7.2f} ms",
          flush=True)

    # ---- full bench workload pieces ----
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.kernels.spmm import chunked_spmm
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.optim import dual_weight_decay_adam
    from sgformer_tpu.train.trainer import TrainConfig, Trainer

    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    graph = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True)
    print(f"graph edges: {graph.num_edges}", flush=True)

    x256 = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)

    def spmm_loop(salt, x, g):
        def body(i, carry):
            x_c, acc = carry
            out = chunked_spmm(x_c, g.chunks, compute_dtype=jnp.bfloat16)
            probe = jnp.sum(out) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    ms = timed(spmm_loop, x256, graph)
    print(f"chunked_spmm fwd bf16 (bench graph): {ms:7.2f} ms"
          f" ({graph.num_edges/ms/1e3:.1f} Medges/s)", flush=True)

    def spmm_grad_loop(salt, x, g):
        def one(xx):
            return jnp.sum(chunked_spmm(xx, g.chunks,
                                        compute_dtype=jnp.bfloat16))

        def body(i, carry):
            x_c, acc = carry
            l, dx = jax.value_and_grad(one)(x_c)
            probe = l + jnp.sum(dx.astype(jnp.float32)) * 1e-30 + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    ms = timed(spmm_grad_loop, x256, graph)
    print(f"chunked_spmm fwd+bwd bf16: {ms:7.2f} ms", flush=True)

    # attention fwd+bwd (XLA path, bf16) at arxiv shape
    from sgformer_tpu.ops.attention import linear_attention
    q = jnp.asarray(rng.standard_normal((N, 1, 256)), dtype=jnp.bfloat16)

    def attn_loop(salt, q):
        def one(qq):
            return jnp.sum(linear_attention(qq, qq, qq).astype(jnp.float32))

        def body(i, carry):
            q_c, acc = carry
            l, dq = jax.value_and_grad(one)(q_c)
            probe = l + salt
            return jnp.where(probe > 1e30, q_c + 1, q_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (q, salt))[1]

    ms = timed(attn_loop, q)
    print(f"linear_attention fwd+bwd bf16 XLA: {ms:7.2f} ms", flush=True)

    from sgformer_tpu.kernels.attention import fused_linear_attention

    def fattn_loop(salt, q):
        def one(qq):
            return jnp.sum(
                fused_linear_attention(qq, qq, qq).astype(jnp.float32))

        def body(i, carry):
            q_c, acc = carry
            l, dq = jax.value_and_grad(one)(q_c)
            probe = l + salt
            return jnp.where(probe > 1e30, q_c + 1, q_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (q, salt))[1]

    ms = timed(fattn_loop, q)
    print(f"fused_linear_attention fwd+bwd bf16: {ms:7.2f} ms", flush=True)

    # ---- full train step (same as bench.py) ----
    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1, gnn_num_layers=3,
                               graph_weight=0.5, compute_dtype="bf16")
    model = SGFormer(cfg)
    tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0)
    trainer = Trainer(model, graph, ds.graph["node_feat"], ds.label, tc)
    rngk = jax.random.PRNGKey(0)
    state, tx, opt_state = trainer.init_state(rngk)
    train_step, eval_step = trainer._build_steps(tx)
    train_idx = jnp.asarray(np.arange(0, N, 2, dtype=np.int32))

    state, opt_state, loss = train_step(state, opt_state, rngk, train_idx)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    steps = 30
    for i in range(steps):
        rngk, drop = jax.random.split(rngk)
        state, opt_state, loss = train_step(state, opt_state, drop, train_idx)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps
    print(f"full train step: {dt*1e3:7.2f} ms"
          f" ({graph.num_edges/dt/1e6:.1f} Medges/s)", flush=True)

    # eval fwd (no grad, no dropout/BN update)
    out = eval_step(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(10):
        out = eval_step(state)
    jax.block_until_ready(out)
    print(f"eval fwd: {(time.perf_counter()-t0)/10*1e3:7.2f} ms", flush=True)

    # ---- slab-mode pieces + full train step (bench.py's current path) ----
    from sgformer_tpu.kernels.slab_spmm import slab_spmm

    t0 = time.time()
    gslab = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                             spmm_mode="ssel")
    print(f"ssel preprocess: {time.time()-t0:.1f}s", flush=True)

    def sspmm_grad_loop(salt, x, g):
        def one(xx):
            return jnp.sum(slab_spmm(xx, g.chunks,
                                     compute_dtype=jnp.bfloat16))

        def body(i, carry):
            x_c, acc = carry
            l, dx = jax.value_and_grad(one)(x_c)
            probe = l + jnp.sum(dx.astype(jnp.float32)) * 1e-30 + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    ms = timed(sspmm_grad_loop, x256, gslab)
    print(f"slab_spmm fwd+bwd bf16: {ms:7.2f} ms", flush=True)

    trainer2 = Trainer(SGFormer(cfg), gslab, ds.graph["node_feat"],
                       ds.label, tc)
    state2, tx2, opt_state2 = trainer2.init_state(rngk)
    train_step2, eval_step2 = trainer2._build_steps(tx2)
    state2, opt_state2, loss2 = train_step2(state2, opt_state2, rngk,
                                            train_idx)
    jax.block_until_ready(loss2)
    t0 = time.perf_counter()
    for i in range(steps):
        rngk, drop = jax.random.split(rngk)
        state2, opt_state2, loss2 = train_step2(state2, opt_state2, drop,
                                                train_idx)
    jax.block_until_ready(loss2)
    dt = (time.perf_counter() - t0) / steps
    print(f"full train step (slab): {dt*1e3:7.2f} ms"
          f" ({gslab.num_edges/dt/1e6:.1f} Medges/s)", flush=True)


if __name__ == "__main__":
    main()
