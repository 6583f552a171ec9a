"""Microbenchmark: HBM row-gather characteristics on the real TPU.

Informs the round-2 SpMM redesign (VERDICT.md task 1): is jnp.take
row-rate-bound or bandwidth-bound?  How much do index locality and row
size matter?  Run with PYTHONPATH=/root/repo:/root/.axon_site.

Timing protocol (hard-won, see CLAUDE.md): the axon relay MEMOIZES whole
dispatches by (computation, argument values) — any repeat call with
identical args returns the cached result instantly.  So every timed call
carries a distinct ``salt`` scalar that feeds the dependency chain, and K
iterations run inside one jitted ``fori_loop`` whose per-iteration output
(a full reduction of the gathered block) feeds the next iteration's
indices, preventing both memoization and dead-code elimination.
"""

import time

import numpy as np

K = 20


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"device: {jax.devices()[0]}", flush=True)

    N = 169_343
    E = 2_500_000
    rng = np.random.default_rng(0)
    idx_random = rng.integers(0, N, E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, E).astype(np.int32))
    order = np.lexsort((idx_random, dst // 128))
    idx_winsorted = idx_random[order]
    # clustered: srcs drawn mostly from the dst's own 4233-node range
    # (what a recovered planted partition gives at arxiv scale)
    cluster = (dst // 4233) * 4233
    local = rng.random(E) < 0.8
    src_clustered = np.where(
        local, (cluster + rng.integers(0, 4233, E)) % N, idx_random
    ).astype(np.int32)
    order2 = np.lexsort((src_clustered, dst // 128))
    idx_clustered = src_clustered[order2]

    salt_counter = [0.0]

    def timed(f, *args):
        """f(salt, *args) jitted; returns ms per inner iteration.  Salts are
        globally unique so the relay can never serve a memoized result, and
        results are value-fetched (float) to guarantee a real sync."""
        fj = jax.jit(f)

        def call():
            salt_counter[0] += 1.0
            return float(fj(jnp.float32(salt_counter[0]), *args))

        call()  # compile+warm
        t0 = time.perf_counter()
        call()
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        call()
        dt2 = time.perf_counter() - t0
        return min(dt1, dt2) / K * 1e3

    def gather_loop(salt, x, idx):
        def body(i, carry):
            idx_c, acc = carry
            out = jnp.take(x, idx_c, axis=0)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            idx_c = jnp.where(probe > 1e30, idx_c ^ 1, idx_c)
            return idx_c, acc + probe
        return jax.lax.fori_loop(0, K, body, (idx, salt))[1]

    # dispatch/loop overhead baseline: same loop, 8-row gather
    tiny = jnp.zeros((8,), dtype=jnp.int32)
    x0 = jnp.zeros((N, 256), dtype=jnp.bfloat16)
    ovh = timed(gather_loop, x0, tiny)
    print(f"loop overhead (8-row gather): {ovh:.3f} ms/iter", flush=True)

    F = 256
    x32 = jnp.asarray(rng.standard_normal((N, F)), dtype=jnp.float32)
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                     ("int8", jnp.int8)):
        x = (x32 * 10).astype(dt)
        for iname, idx in (
            ("random   ", idx_random),
            ("winsorted", idx_winsorted),
            ("clustered", idx_clustered),
        ):
            ms = timed(gather_loop, x, jnp.asarray(idx))
            gb = E * F * x.dtype.itemsize / 1e9
            print(
                f"take F={F} {name} {iname}: {ms:7.2f} ms"
                f" ({gb/ms*1e3:6.1f} GB/s gathered,"
                f" {E/ms/1e3:6.1f} Mrows/s)",
                flush=True,
            )

    for F2 in (64, 128, 512):
        x = jnp.asarray(rng.standard_normal((N, F2)), dtype=jnp.bfloat16)
        ms = timed(gather_loop, x, jnp.asarray(idx_random))
        gb = E * F2 * 2 / 1e9
        print(
            f"take F={F2} bf16 random   : {ms:7.2f} ms"
            f" ({gb/ms*1e3:6.1f} GB/s, {E/ms/1e3:6.1f} Mrows/s)",
            flush=True,
        )

    # sequential-copy reference (x2 traffic)
    def copy_loop(salt, x):
        def body(i, carry):
            x_c, acc = carry
            y = x_c * 1.0000001
            probe = jnp.sum(y.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, x_c, y), acc + probe
        return jax.lax.fori_loop(0, K, body, (x, salt))[1]

    x = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)
    ms = timed(copy_loop, x)
    gb = N * 256 * 2 * 2 / 1e9
    print(f"elementwise copy [N,256] bf16: {ms:.3f} ms ({gb/ms*1e3:.0f} GB/s rw)",
          flush=True)

    # current chunked SpMM (bf16 messages), random vs clustered layout
    from sgformer_tpu.kernels.chunks import build_chunks
    from sgformer_tpu.kernels.spmm import chunked_spmm

    w = np.ones(E, dtype=np.float32)
    xb = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)
    for nm, (s_, d_) in (
        ("random   ", (idx_random, dst)),
        ("clustered", (src_clustered, dst)),
    ):
        o = np.argsort(d_, kind="stable")
        plan = build_chunks(s_[o], d_[o], w[o], N)

        def spmm_loop(salt, x, plan):
            def body(i, carry):
                x_c, acc = carry
                out = chunked_spmm(x_c, plan, compute_dtype=jnp.bfloat16)
                probe = jnp.sum(out) + salt
                return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (x, salt))[1]

        ms = timed(spmm_loop, xb, plan)
        print(f"chunked_spmm bf16 {nm}: {ms:7.2f} ms ({E/ms/1e3:.1f} Medges/s)",
              flush=True)


if __name__ == "__main__":
    main()
