"""Slab SpMM vs gather SpMM on the real chip, arxiv-shaped bench graph.

Salted dispatches + on-device loops (relay memoizes identical calls).
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

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.kernels.slab_spmm import slab_spmm
    from sgformer_tpu.kernels.slabs import locality_fraction
    from sgformer_tpu.kernels.spmm import chunked_spmm

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    t0 = time.time()
    g_slab = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                              spmm_mode="slab")
    print(f"slab preprocess: {time.time()-t0:.1f}s", flush=True)
    plan = g_slab.chunks
    loc = 1.0 - (
        0.0 if plan.fwd.remote is None
        else float(np.sum(np.asarray(plan.fwd.remote.weight) != 0))
        / g_slab.num_edges
    )
    print(f"edges: {g_slab.num_edges}, local frac (incl self): {loc:.3f}, "
          f"fwd steps: {plan.fwd.n_steps}", flush=True)

    g_chunk = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)

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

    def slab_loop(salt, x, p):
        def body(i, carry):
            x_c, acc = carry
            out = slab_spmm(x_c, p, compute_dtype=jnp.bfloat16)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    ms = timed(slab_loop, x, plan)
    print(f"slab_spmm fwd bf16: {ms:7.2f} ms "
          f"({g_slab.num_edges/ms/1e3:.1f} Medges/s)", flush=True)

    def chunk_loop(salt, x, p):
        def body(i, carry):
            x_c, acc = carry
            out = chunked_spmm(x_c, p, compute_dtype=jnp.bfloat16)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    ms = timed(chunk_loop, x, g_chunk.chunks)
    print(f"chunked_spmm fwd bf16: {ms:7.2f} ms "
          f"({g_chunk.num_edges/ms/1e3:.1f} Medges/s)", flush=True)

    # part-wise: local pallas call alone / remote gather plan alone
    from sgformer_tpu.kernels.slab_spmm import _apply_local
    from sgformer_tpu.kernels.spmm import _apply_plan

    xp = jnp.pad(x, ((0, plan.n_pad - x.shape[0]), (0, 0)))

    def local_loop(salt, xp, p):
        prev0 = jnp.zeros((p.fwd.num_rows_out, xp.shape[1]), jnp.float32)

        def body(i, carry):
            x_c, acc = carry
            out = _apply_local(x_c, prev0, p.fwd, jnp.bfloat16, False)
            probe = jnp.sum(out) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

    ms = timed(local_loop, xp, plan)
    print(f"  local part alone: {ms:7.2f} ms ({plan.fwd.n_steps} steps)",
          flush=True)

    def remote_loop(salt, xp, p):
        def body(i, carry):
            x_c, acc = carry
            out = _apply_plan(x_c, p.fwd.remote, jnp.bfloat16, False)
            probe = jnp.sum(out) + salt
            return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

    if plan.fwd.remote is not None:
        nrem = int(np.sum(np.asarray(plan.fwd.remote.weight) != 0))
        ms = timed(remote_loop, xp, plan)
        print(f"  remote part alone: {ms:7.2f} ms ({nrem} edges, "
              f"{ms/nrem*1e6:.1f} ns/edge)", flush=True)

    # correctness on-chip: compiled slab vs compiled XLA oracle
    # (separate f32 graph: f32 slabs are capped to fit VMEM)
    from sgformer_tpu.ops.spmm import spmm

    g32 = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                           spmm_mode="slab", chunk_dtype="f32")
    xf = x.astype(jnp.float32)
    want = jax.jit(
        lambda xx: spmm(xx, g32.edge_src, g32.edge_dst,
                        g32.gcn_weight, N)
    )(xf)
    got = jax.jit(
        lambda xx: slab_spmm(xx, g32.chunks, compute_dtype=jnp.float32)
    )(xf)
    err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
    print(f"compiled f32 slab vs XLA oracle rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
