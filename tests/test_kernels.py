"""Pallas kernel correctness (interpret mode on the CPU mesh) vs the XLA
segment_sum oracle — fwd, transpose/bwd, weights, padding windows, and the
Graph integration (SURVEY.md §4(a))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.kernels import build_chunks, chunked_spmm
from sgformer_tpu.ops.spmm import spmm

import reference_numpy as ref


@pytest.fixture(scope="module")
def coo():
    rng = np.random.default_rng(3)
    n, e = 300, 2000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    w = rng.random(e).astype(np.float32)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    return n, src, dst, w, x


def test_chunked_spmm_fwd_matches_xla(coo):
    n, src, dst, w, x = coo
    plan = build_chunks(src, dst, w, n, chunk_edges=256, window_rows=128)
    want = spmm(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), n)
    got = chunked_spmm(
        jnp.asarray(x), plan, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_chunked_spmm_grad_matches_xla(coo):
    n, src, dst, w, x = coo
    plan = build_chunks(src, dst, w, n, chunk_edges=128, window_rows=64)
    g = jnp.asarray(np.random.default_rng(4).standard_normal((n, 64)).astype(np.float32))

    def loss_xla(x):
        return (spmm(x, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), n) * g).sum()

    def loss_pl(x):
        return (chunked_spmm(x, plan, compute_dtype=jnp.float32, interpret=True) * g).sum()

    dx_want = jax.grad(loss_xla)(jnp.asarray(x))
    dx_got = jax.grad(loss_pl)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_want), rtol=1e-5, atol=1e-5)


def test_chunked_spmm_empty_windows():
    """Windows with zero edges must still produce zero rows (not garbage)."""
    n = 400
    # all edges target the first 10 nodes; most windows are empty
    src = np.arange(50, dtype=np.int64)
    dst = np.repeat(np.arange(5, dtype=np.int64), 10)
    w = np.ones(50, dtype=np.float32)
    plan = build_chunks(src, dst, w, n, chunk_edges=128, window_rows=64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, 32)).astype(np.float32))
    got = chunked_spmm(x, plan, compute_dtype=jnp.float32, interpret=True)
    want = spmm(x, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got)[200:] == 0)


def test_graph_chunked_propagate_matches_dense_oracle():
    rng = np.random.default_rng(9)
    n = 150
    edge_index = ref.random_graph(rng, n, 700)
    g = preprocess_graph(
        edge_index, n, with_chunks=True, chunk_edges=128, window_rows=64,
        chunk_dtype="f32", chunk_interpret=True,
    )
    x = rng.standard_normal((n, 32)).astype(np.float32)
    adj = ref.gcn_adj_dense(np.asarray(g.edge_src), np.asarray(g.edge_dst), n)
    want = adj @ x.astype(np.float64)
    got = np.asarray(g.propagate(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_graph_chunked_model_forward_matches_unchunked():
    """Full SGFormer forward with the chunked graph == XLA-path graph."""
    from sgformer_tpu.nn import SGFormer, SGFormerConfig

    rng = np.random.default_rng(5)
    n = 100
    edge_index = ref.random_graph(rng, n, 500)
    g_plain = preprocess_graph(edge_index, n, with_pyg_norm=True)
    g_chunk = preprocess_graph(
        edge_index, n, with_pyg_norm=True, with_chunks=True,
        chunk_edges=128, window_rows=64, chunk_dtype="f32", chunk_interpret=True,
    )
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    model = SGFormer(SGFormerConfig(24, 5, gnn="graphconv"))
    variables = model.init(jax.random.PRNGKey(0), x, g_plain, train=False)
    want = np.asarray(model.apply(variables, x, g_plain, train=False))
    got = np.asarray(model.apply(variables, x, g_chunk, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused linear attention (kernels/attention.py)
# ---------------------------------------------------------------------------


def test_fused_attention_fwd_matches_xla():
    from sgformer_tpu.kernels.attention import fused_linear_attention
    from sgformer_tpu.ops.attention import linear_attention

    rng = np.random.default_rng(1)
    n, h, m = 300, 2, 32
    q = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))
    want = np.asarray(linear_attention(q, k, v))
    got = np.asarray(fused_linear_attention(q, k, v, block=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fused_attention_masked_fwd():
    from sgformer_tpu.kernels.attention import fused_linear_attention
    from sgformer_tpu.ops.attention import linear_attention

    rng = np.random.default_rng(2)
    n, m = 200, 16
    q = jnp.asarray(rng.standard_normal((n, 1, m)).astype(np.float32))
    mask = jnp.asarray((np.arange(n) < 150).astype(np.float32))
    want = np.asarray(linear_attention(q, q, q, node_mask=mask))
    got = np.asarray(
        fused_linear_attention(q, q, q, node_mask=mask, block=64, interpret=True)
    )
    np.testing.assert_allclose(got[:150], want[:150], rtol=1e-3, atol=1e-3)


def test_fused_attention_grads_match_xla():
    """The hand-derived VJP is exact in f64 (verified analytically); at f32
    the global-norm structure cancels catastrophically for large N, so the
    grad comparison runs at moderate N where f32 noise ≪ signal."""
    from sgformer_tpu.kernels.attention import fused_linear_attention
    from sgformer_tpu.ops.attention import linear_attention

    rng = np.random.default_rng(3)
    n, h, m = 48, 1, 16
    q = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, h, m)).astype(np.float32))

    want = jax.grad(
        lambda q, k, v: (linear_attention(q, k, v) * g).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    got = jax.grad(
        lambda q, k, v: (
            fused_linear_attention(q, k, v, block=64, interpret=True) * g
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)


def test_chunked_spmm_streamed_segments_match(coo):
    """Scan-streamed restacked plans (for huge edge counts) == single-call
    path, fwd and grad (the grad streams through the transpose plan)."""
    import dataclasses

    from sgformer_tpu.kernels.chunks import _restack_streamed

    n, src, dst, w, x = coo
    plan = build_chunks(src, dst, w, n, chunk_edges=128, window_rows=64)
    assert plan.fwd.num_chunks > 4  # meaningful split below
    want = chunked_spmm(
        jnp.asarray(x), plan, compute_dtype=jnp.float32, interpret=True
    )
    g = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 64)).astype(np.float32)
    )
    want_dx = jax.grad(lambda x: (chunked_spmm(
        x, plan, compute_dtype=jnp.float32, interpret=True) * g).sum())(
            jnp.asarray(x))
    streamed = dataclasses.replace(
        plan,
        fwd=_restack_streamed(plan.fwd, 4),
        bwd=_restack_streamed(plan.bwd, 4),
    )
    nseg, s_max, V = streamed.fwd.stream_shape
    assert nseg > 1
    assert streamed.fwd.gather_idx.shape == (nseg, s_max, 128)
    got = chunked_spmm(
        jnp.asarray(x), streamed, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    got_dx = jax.grad(lambda x: (chunked_spmm(
        x, streamed, compute_dtype=jnp.float32, interpret=True) * g).sum())(
            jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               rtol=1e-5, atol=1e-5)


def test_chunked_spmm_edge_values_fwd_and_grads(coo):
    """Runtime-weighted kernel (GAT path): fwd, dx, and d(edge_values)
    all match the XLA gather+segment_sum formulation."""
    from sgformer_tpu.kernels.spmm import chunked_spmm_edge_values

    n, src, dst, w, x = coo
    plan = build_chunks(src, dst, w, n, chunk_edges=128, window_rows=64,
                        with_perm=True)
    rng = np.random.default_rng(11)
    ev = jnp.asarray(rng.random(len(src)).astype(np.float32))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    xj = jnp.asarray(x)

    def ref(x, ev):
        return spmm(x, srcj, dstj, ev, n)

    def ker(x, ev):
        return chunked_spmm_edge_values(
            x, plan, ev, srcj, dstj, compute_dtype=jnp.float32, interpret=True
        )

    np.testing.assert_allclose(np.asarray(ker(xj, ev)), np.asarray(ref(xj, ev)),
                               rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    want = jax.grad(lambda x, ev: (ref(x, ev) * g).sum(), argnums=(0, 1))(xj, ev)
    got = jax.grad(lambda x, ev: (ker(x, ev) * g).sum(), argnums=(0, 1))(xj, ev)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_stream_segment_invariants():
    """compute_stream_segments partitions chunks contiguously, spans
    uniform window ranges, and reports the true max segment size — over
    random window-count distributions (incl. single giant windows)."""
    from sgformer_tpu.kernels.chunks import compute_stream_segments

    rng = np.random.default_rng(11)
    for trial in range(40):
        n_windows = int(rng.integers(1, 60))
        counts = rng.integers(1, 12, n_windows)
        if trial % 5 == 0:  # a window bigger than max_chunks alone
            counts[rng.integers(0, n_windows)] += 40
        wid = np.repeat(np.arange(n_windows, dtype=np.int32), counts)
        max_chunks = int(rng.integers(2, 30))
        nseg, V, s_max, bounds = compute_stream_segments(wid, max_chunks)
        assert nseg == len(bounds)
        assert (nseg - 1) * V < n_windows <= nseg * V
        # contiguous partition of [0, nc)
        assert bounds[0][0] == 0 and bounds[-1][1] == len(wid)
        for (a0, b0), (a1, b1) in zip(bounds, bounds[1:]):
            assert b0 == a1 and b0 >= a0
        # each segment holds exactly the chunks of its window span
        for s, (a, b) in enumerate(bounds):
            if b > a:
                assert wid[a] >= s * V and wid[b - 1] < (s + 1) * V
        assert s_max == max(b - a for a, b in bounds)
        assert s_max <= max_chunks or V == 1
