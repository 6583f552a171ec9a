"""Locate non-SpMM cost in the arxiv train step (ssel graph).

Times, with the salted fori-loop protocol: raw ssel SpMM fwd(+bwd), the
GCN branch alone fwd+bwd, the attention branch alone fwd+bwd, and the
full SGFormer loss fwd+bwd — the deltas isolate where the step's
non-kernel time goes.  Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
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
    from sgformer_tpu.kernels.slab_spmm import slab_spmm
    from sgformer_tpu.nn import SGFormer, SGFormerConfig

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    t0 = time.time()
    g = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                         spmm_mode="ssel")
    print(f"preprocess: {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((N, 128)), dtype=jnp.float32)
    x256 = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)
    label = jnp.asarray(rng.integers(0, 40, N).astype(np.int32))

    cfg = SGFormerConfig.large(256, 40, trans_num_layers=1,
                               gnn_num_layers=3, graph_weight=0.5,
                               compute_dtype="bf16")
    model = SGFormer(cfg)
    variables = jax.jit(
        lambda r, x, gg: model.init(r, x, gg, train=False)
    )(jax.random.PRNGKey(0), feats, g)
    params = variables["params"]
    bs = variables.get("batch_stats", {})

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

    # ---- raw ssel SpMM fwd / fwd+bwd ----
    def spmm_fwd(salt, x, gg):
        def body(i, carry):
            x_c, acc = carry
            out = slab_spmm(x_c, gg.chunks, compute_dtype=jnp.bfloat16)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    print(f"ssel fwd: {timed(spmm_fwd, x256, g):7.2f} ms", flush=True)

    def spmm_fb(salt, x, gg):
        def one(xx):
            return jnp.sum(slab_spmm(xx, gg.chunks,
                                     compute_dtype=jnp.bfloat16))

        def body(i, carry):
            x_c, acc = carry
            l, dx = jax.value_and_grad(one)(x_c)
            probe = l + jnp.sum(dx.astype(jnp.float32)) * 1e-30 + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    print(f"ssel fwd+bwd: {timed(spmm_fb, x256, g):7.2f} ms", flush=True)

    # ---- branch-level fwd+bwd ----
    def branch_loss(apply_fn):
        def loop(salt, p, x, gg):
            def one(pp, xx):
                out = apply_fn(pp, xx, gg)
                return jnp.sum(out.astype(jnp.float32))

            def body(i, carry):
                x_c, acc = carry
                l, dp = jax.value_and_grad(one)(p, x_c)
                lead = jax.tree_util.tree_leaves(dp)[0]
                probe = l + jnp.sum(lead.astype(jnp.float32)) * 1e-30 + salt
                return jnp.where(probe > 1e30, x_c + 1e-8, x_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (x, salt))[1]
        return loop

    def gcn_apply(p, x, gg):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, gg, train=True,
            method=lambda m, xx, g_, train: m.graph_conv(
                xx, g_, train=train),
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return out

    print(f"gcn branch fwd+bwd: "
          f"{timed(branch_loss(gcn_apply), params, feats, g):7.2f} ms",
          flush=True)

    def attn_apply(p, x, gg):
        out = model.apply(
            {"params": p, "batch_stats": bs}, x, gg, train=True,
            method=lambda m, xx, g_, train: m.trans_conv(
                xx, train=train),
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return out

    print(f"attn branch fwd+bwd: "
          f"{timed(branch_loss(attn_apply), params, feats, g):7.2f} ms",
          flush=True)

    def full_apply(p, x, gg):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, gg, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return out

    print(f"full model fwd+bwd: "
          f"{timed(branch_loss(full_apply), params, feats, g):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
