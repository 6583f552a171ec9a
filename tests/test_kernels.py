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
