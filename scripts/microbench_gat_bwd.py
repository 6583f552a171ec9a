"""GAT aggregation fwd+bwd timing — and the record of a NEGATIVE result.

Round-2c experiment: replace the d(edge_values) two-[E,F]-gather XLA
formulation (kernels/spmm.py::_spmm_ev_bwd) with an MXU chunk-SDDMM
(reuse the fwd's materialized msgs as a residual; turn the g-row gather
into a one-hot window matmul; map slots back to edge order with a
host-precomputed permutation).  Measured on the 2.5M-edge arxiv-shaped
graph (bf16, F=256, C=1024 plans):

    fwd+bwd, XLA two-gather dv            56.5 ms   (44.2 Medges/s)
    fwd+bwd, chunk-SDDMM dv               78.0 ms   (32.0 Medges/s)
    - sddmm kernel alone                   6.3 ms
    - slot->edge [E] 1-D gather alone     19.9 ms

Two lessons: (1) the 7.4 ns/row gather wall applies to 1-D SCALAR
permutation gathers too — any slot-order kernel output pays ~20 ms to
get back to edge order at this scale; (2) XLA's fused
``sum(g[dst]·x[src], -1)`` costs FAR less than 2x the single-gather
wall — the two gather streams and the reduce overlap, while a pallas
call in the middle of the bwd serializes against its neighbors.  The
MXU dv was therefore NOT shipped; this script times the shipped path.

Salted fori-loop protocol (CLAUDE.md).
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
    from sgformer_tpu.kernels.spmm import chunked_spmm_edge_values

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                         chunk_perm=True, chunk_dtype="bf16")
    E = g.num_edges
    print(f"edges: {E}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 256)) * 0.1, jnp.bfloat16)
    ev = jnp.asarray(rng.random(E).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((N, 256)) * 0.1, jnp.float32)

    salt = [0.0]

    def run(s, xx, vv, ch):
        def it(i, carry):
            s, acc = carry

            def loss(a, b):
                out = chunked_spmm_edge_values(
                    a + s.astype(a.dtype), ch, b, g.edge_src, g.edge_dst,
                    compute_dtype=jnp.bfloat16,
                )
                return jnp.sum(out.astype(jnp.float32) * co)

            dx, dv = jax.grad(loss, argnums=(0, 1))(xx, vv)
            probe = (jnp.sum(dx.astype(jnp.float32))
                     + jnp.sum(dv.astype(jnp.float32)))
            return (s + probe * 0.0 + 1.0, acc + probe)

        return jax.lax.fori_loop(0, K, it, (s, jnp.float32(0.0)))[1]

    fj = jax.jit(run)

    def call():
        salt[0] += 1.0
        return float(fj(jnp.float32(salt[0] * 1e-12), x, ev, g.chunks))

    call()
    best = min(
        (lambda t0=time.perf_counter():
         (call(), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    print(f"{'GAT aggregation fwd+bwd (shipped path)':45s} "
          f"{best / K * 1e3:7.2f} ms  ({E / (best / K) / 1e6:6.1f} "
          f"Medges/s)", flush=True)


if __name__ == "__main__":
    main()
