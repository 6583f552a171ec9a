"""Real-TPU kernel regression gate (VERDICT round-1 task 7).

Runs every Pallas kernel COMPILED on the attached chip against its XLA
oracle — fwd and grad — and fails loudly on mismatch.  Interpret-mode CI
cannot catch Mosaic miscompiles (CLAUDE.md lists three already hit); this
is the scripted on-chip check.  Seconds on a warm compile cache.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_kernels.py
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        print("SKIP: no TPU attached (backend=%s)" % jax.default_backend())
        return 0

    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.kernels.attention import fused_linear_attention
    from sgformer_tpu.kernels.chunks import build_chunks
    from sgformer_tpu.kernels.slab_spmm import slab_spmm
    from sgformer_tpu.kernels.spmm import chunked_spmm, chunked_spmm_edge_values
    from sgformer_tpu.ops.attention import linear_attention
    from sgformer_tpu.ops.spmm import spmm

    rng = np.random.default_rng(0)
    N, E = 20_000, 120_000
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    # clustered block so the slab path has local work
    half = E // 2
    base = (dst[:half] // 2048) * 2048
    src[:half] = (base + rng.integers(0, 2048, half)) % N
    ei = np.stack([src, dst])
    g_chunk = preprocess_graph(ei, N, with_chunks=True, chunk_dtype="f32")
    g_slab = preprocess_graph(ei, N, with_chunks=True, spmm_mode="slab",
                              chunk_dtype="f32", slab_rows=2048)
    x = jnp.asarray(rng.standard_normal((N, 128)), dtype=jnp.float32)
    co = jnp.asarray(rng.standard_normal((N, 128)), dtype=jnp.float32)

    failures = []

    def check(name, got, want, tol):
        got, want = np.asarray(got), np.asarray(want)
        err = float(
            np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        )
        ok = np.isfinite(got).all() and err < tol
        print(f"{'PASS' if ok else 'FAIL'} {name}: rel err {err:.2e}"
              f" (tol {tol:g})", flush=True)
        if not ok:
            failures.append(name)

    # ---- chunked SpMM (gather path), f32 exact ----
    oracle = jax.jit(
        lambda xx: spmm(xx, g_chunk.edge_src, g_chunk.edge_dst,
                        g_chunk.gcn_weight, N)
    )
    want = oracle(x)
    got = jax.jit(
        lambda xx: chunked_spmm(xx, g_chunk.chunks,
                                compute_dtype=jnp.float32)
    )(x)
    check("chunked_spmm fwd f32", got, want, 1e-5)

    g_want = jax.jit(jax.grad(lambda xx: jnp.sum(oracle(xx) * co)))(x)
    g_got = jax.jit(jax.grad(
        lambda xx: jnp.sum(
            chunked_spmm(xx, g_chunk.chunks, compute_dtype=jnp.float32) * co
        )
    ))(x)
    check("chunked_spmm grad f32", g_got, g_want, 1e-5)

    # ---- slab SpMM (gather-free path), f32 exact ----
    # oracle in the slab graph's RELABELED node space
    oracle_s = jax.jit(
        lambda xx: spmm(xx, g_slab.edge_src, g_slab.edge_dst,
                        g_slab.gcn_weight, N)
    )
    want = oracle_s(x)
    got = jax.jit(
        lambda xx: slab_spmm(xx, g_slab.chunks, compute_dtype=jnp.float32)
    )(x)
    check("slab_spmm fwd f32", got, want, 1e-5)

    g_want = jax.jit(jax.grad(lambda xx: jnp.sum(oracle_s(xx) * co)))(x)
    g_got = jax.jit(jax.grad(
        lambda xx: jnp.sum(
            slab_spmm(xx, g_slab.chunks, compute_dtype=jnp.float32) * co
        )
    ))(x)
    check("slab_spmm grad f32", g_got, g_want, 1e-5)

    # ---- streamed-selector slab SpMM (ssel), f32 exact ----
    g_ssel = preprocess_graph(ei, N, with_chunks=True, spmm_mode="ssel",
                              chunk_dtype="f32", slab_rows=2048)
    oracle_ss = jax.jit(
        lambda xx: spmm(xx, g_ssel.edge_src, g_ssel.edge_dst,
                        g_ssel.gcn_weight, N)
    )
    want = oracle_ss(x)
    # the selector plan MUST be a jit ARGUMENT: as a closure constant it
    # inlines 100s of MB into the HLO and blows the remote-compile relay's
    # request size limit (HTTP 413)
    got = jax.jit(
        lambda xx, ch: slab_spmm(xx, ch, compute_dtype=jnp.float32)
    )(x, g_ssel.chunks)
    check("ssel_spmm fwd f32", got, want, 1e-5)

    g_want = jax.jit(jax.grad(lambda xx: jnp.sum(oracle_ss(xx) * co)))(x)
    g_got = jax.jit(jax.grad(
        lambda xx, ch: jnp.sum(
            slab_spmm(xx, ch, compute_dtype=jnp.float32) * co
        ),
        argnums=0,
    ))(x, g_ssel.chunks)
    check("ssel_spmm grad f32", g_got, g_want, 1e-5)

    # ---- int8-selector (sep) ssel SpMM, bf16 vs f32 oracle ----
    g_sep = preprocess_graph(ei, N, with_chunks=True, spmm_mode="ssel",
                             chunk_dtype="bf16", slab_rows=2048)
    assert g_sep.chunks.pre_scale is not None, "sep mode not engaged"
    oracle_sep = jax.jit(
        lambda xx: spmm(xx, g_sep.edge_src, g_sep.edge_dst,
                        g_sep.gcn_weight, N)
    )
    want = oracle_sep(x)
    got = jax.jit(
        lambda xx, ch: slab_spmm(xx, ch, compute_dtype=jnp.bfloat16)
    )(x, g_sep.chunks)
    check("sep_spmm fwd bf16", got, want, 3e-2)

    g_want = jax.jit(jax.grad(lambda xx: jnp.sum(oracle_sep(xx) * co)))(x)
    g_got = jax.jit(jax.grad(
        lambda xx, ch: jnp.sum(
            slab_spmm(xx, ch, compute_dtype=jnp.bfloat16) * co
        ),
        argnums=0,
    ))(x, g_sep.chunks)
    check("sep_spmm grad bf16", g_got, g_want, 3e-2)

    # ---- int8 slab (q8) ssel SpMM: per-pass absmax quantization ----
    g_q8 = preprocess_graph(ei, N, with_chunks=True, spmm_mode="ssel",
                            chunk_dtype="bf16", slab_rows=2048,
                            slab_geometry={"slab_dtype": "int8"})
    assert g_q8.chunks.slab_dtype == "int8", "int8 slab mode not engaged"
    got = jax.jit(
        lambda xx, ch: slab_spmm(xx, ch, compute_dtype=jnp.bfloat16)
    )(x, g_q8.chunks)
    check("q8_spmm fwd bf16", got, oracle_sep(xx=x), 4e-2)
    g_got = jax.jit(jax.grad(
        lambda xx, ch: jnp.sum(
            slab_spmm(xx, ch, compute_dtype=jnp.bfloat16) * co
        ),
        argnums=0,
    ))(x, g_q8.chunks)
    check("q8_spmm grad bf16", g_got, g_want, 4e-2)

    # ---- int8 slab with F NOT a multiple of 128 (internal feature
    # padding, round 4: 'auto'-selected int8 must work at any hidden) ----
    x192 = jnp.asarray(rng.standard_normal((N, 192)), dtype=jnp.float32)
    co192 = jnp.asarray(rng.standard_normal((N, 192)), dtype=jnp.float32)
    want192 = jax.jit(
        lambda xx: spmm(xx, g_q8.edge_src, g_q8.edge_dst,
                        g_q8.gcn_weight, N)
    )(x192)
    got192 = jax.jit(
        lambda xx, ch: slab_spmm(xx, ch, compute_dtype=jnp.bfloat16)
    )(x192, g_q8.chunks)
    check("q8_spmm fwd bf16 F=192 (padded)", got192, want192, 4e-2)
    gw192 = jax.jit(jax.grad(lambda xx: jnp.sum(jax.jit(
        lambda yy: spmm(yy, g_q8.edge_src, g_q8.edge_dst,
                        g_q8.gcn_weight, N))(xx) * co192)))(x192)
    gg192 = jax.jit(jax.grad(
        lambda xx, ch: jnp.sum(
            slab_spmm(xx, ch, compute_dtype=jnp.bfloat16) * co192
        ),
        argnums=0,
    ))(x192, g_q8.chunks)
    check("q8_spmm grad bf16 F=192 (padded)", gg192, gw192, 4e-2)

    # ---- hub-resident scratch tail (power-law mode), f32 exact ----
    g_hub = preprocess_graph(ei, N, with_chunks=True, spmm_mode="ssel",
                             chunk_dtype="f32", slab_rows=2048,
                             slab_geometry={"hub_rows": 256,
                                            "min_pair": 2})
    assert g_hub.chunks.fwd.hub_ids is not None, "hub mode not engaged"
    oracle_h = jax.jit(
        lambda xx: spmm(xx, g_hub.edge_src, g_hub.edge_dst,
                        g_hub.gcn_weight, N)
    )
    want = oracle_h(x)
    got = jax.jit(
        lambda xx, ch: slab_spmm(xx, ch, compute_dtype=jnp.float32)
    )(x, g_hub.chunks)
    check("hub_spmm fwd f32", got, want, 1e-5)

    g_want = jax.jit(jax.grad(lambda xx: jnp.sum(oracle_h(xx) * co)))(x)
    g_got = jax.jit(jax.grad(
        lambda xx, ch: jnp.sum(
            slab_spmm(xx, ch, compute_dtype=jnp.float32) * co
        ),
        argnums=0,
    ))(x, g_hub.chunks)
    check("hub_spmm grad f32", g_got, g_want, 1e-5)

    # ---- runtime edge values (GAT aggregation) ----
    gp = preprocess_graph(ei, N, with_chunks=True, chunk_perm=True,
                          chunk_dtype="f32")
    ev = jnp.asarray(
        rng.standard_normal(gp.num_edges).astype(np.float32) * 0.1
    )
    want = jax.jit(
        lambda xx, vv: spmm(xx, gp.edge_src, gp.edge_dst, vv, N)
    )(x, ev)
    got = jax.jit(
        lambda xx, vv: chunked_spmm_edge_values(
            xx, gp.chunks, vv, gp.edge_src, gp.edge_dst,
            compute_dtype=jnp.float32,
        )
    )(x, ev)
    check("chunked_spmm_edge_values fwd f32", got, want, 1e-5)

    # full GAT-path grads compiled on chip (dx via the transpose-plan
    # kernel, dv via the fused two-gather XLA formulation — the MXU
    # chunk-SDDMM alternative measured SLOWER end-to-end and was not
    # shipped, scripts/microbench_gat_bwd.py)
    g_want, v_want = jax.jit(jax.grad(
        lambda xx, vv: jnp.sum(spmm(xx, gp.edge_src, gp.edge_dst, vv, N) * co),
        argnums=(0, 1),
    ))(x, ev)
    g_got, v_got = jax.jit(jax.grad(
        lambda xx, vv: jnp.sum(
            chunked_spmm_edge_values(
                xx, gp.chunks, vv, gp.edge_src, gp.edge_dst,
                compute_dtype=jnp.float32,
            ) * co
        ),
        argnums=(0, 1),
    ))(x, ev)
    check("chunked_spmm_edge_values dx f32", g_got, g_want, 1e-5)
    check("chunked_spmm_edge_values dv f32", v_got, v_want, 1e-5)

    # ---- fused linear attention ----
    q = jnp.asarray(rng.standard_normal((N, 1, 64)), dtype=jnp.float32)
    want = jax.jit(lambda qq: linear_attention(qq, qq, qq))(q)
    got = jax.jit(lambda qq: fused_linear_attention(qq, qq, qq))(q)
    check("fused_attention fwd f32", got, want, 1e-4)

    cq = jnp.asarray(rng.standard_normal((N, 1, 64)), dtype=jnp.float32)
    g_want = jax.jit(jax.grad(
        lambda qq: jnp.sum(linear_attention(qq, qq, qq) * cq)
    ))(q)
    g_got = jax.jit(jax.grad(
        lambda qq: jnp.sum(fused_linear_attention(qq, qq, qq) * cq)
    ))(q)
    check("fused_attention grad f32", g_got, g_want, 1e-3)

    if failures:
        print(f"KERNEL GATE FAILED: {failures}", flush=True)
        return 1
    print("KERNEL GATE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
