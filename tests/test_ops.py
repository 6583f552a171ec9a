"""Kernel-level parity: JAX ops vs the numpy oracle of the reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.ops.attention import linear_attention
from sgformer_tpu.ops.spmm import segment_mean, spmm

import reference_numpy as ref


@pytest.mark.parametrize("heads,dim", [(1, 16), (4, 8)])
def test_linear_attention_matches_reference(heads, dim):
    rng = np.random.default_rng(0)
    n = 64
    qs = rng.standard_normal((n, heads, dim)).astype(np.float32)
    ks = rng.standard_normal((n, heads, dim)).astype(np.float32)
    vs = rng.standard_normal((n, heads, dim)).astype(np.float32)

    got = linear_attention(jnp.asarray(qs), jnp.asarray(ks), jnp.asarray(vs))
    want = ref.full_attention_conv(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_linear_attention_output_attn():
    rng = np.random.default_rng(1)
    n, h, d = 32, 2, 8
    qs = rng.standard_normal((n, h, d)).astype(np.float32)
    ks = rng.standard_normal((n, h, d)).astype(np.float32)
    vs = rng.standard_normal((n, h, d)).astype(np.float32)

    got_out, got_attn = linear_attention(
        jnp.asarray(qs), jnp.asarray(ks), jnp.asarray(vs), output_attn=True
    )
    want_out, want_attn = ref.full_attention_conv(qs, ks, vs, output_attn=True)
    np.testing.assert_allclose(np.asarray(got_out), want_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn, rtol=1e-5, atol=1e-5)


def test_linear_attention_grad_finite():
    rng = np.random.default_rng(2)
    n, h, d = 16, 1, 8
    qs = jnp.asarray(rng.standard_normal((n, h, d)), dtype=jnp.float32)

    def loss(q):
        return linear_attention(q, q, q).sum()

    g = jax.grad(loss)(qs)
    assert np.all(np.isfinite(np.asarray(g)))


def test_spmm_matches_dense():
    rng = np.random.default_rng(3)
    n, e = 50, 300
    edge_index = ref.random_graph(rng, n, e)
    g = preprocess_graph(edge_index, n, undirected=True, self_loops=True)
    x = rng.standard_normal((n, 12)).astype(np.float32)

    got = spmm(jnp.asarray(x), g.edge_src, g.edge_dst, g.gcn_weight, n)
    adj = ref.gcn_adj_dense(np.asarray(g.edge_src), np.asarray(g.edge_dst), n)
    np.testing.assert_allclose(np.asarray(got), adj @ x, rtol=1e-4, atol=1e-5)


def test_spmm_isolated_nodes_zero():
    # isolated node rows must be exactly zero (nan_to_num semantics,
    # large/ours.py:32)
    src = np.array([0, 1])
    dst = np.array([1, 0])
    g = preprocess_graph(np.stack([src, dst]), 4, undirected=False, self_loops=False)
    x = jnp.ones((4, 3), dtype=jnp.float32)
    out = np.asarray(spmm(x, g.edge_src, g.edge_dst, g.gcn_weight, 4))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[2:], 0.0)


def test_spmm_grad_is_transpose_spmm():
    rng = np.random.default_rng(4)
    n, e = 30, 120
    edge_index = ref.random_graph(rng, n, e)
    g = preprocess_graph(edge_index, n)
    x = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)

    def f(x):
        return spmm(x, g.edge_src, g.edge_dst, g.gcn_weight, n).sum()

    grad = np.asarray(jax.grad(f)(x))
    adj = ref.gcn_adj_dense(np.asarray(g.edge_src), np.asarray(g.edge_dst), n)
    want = adj.T @ np.ones((n, 8))
    np.testing.assert_allclose(grad, want, rtol=1e-4, atol=1e-5)


def test_segment_mean():
    data = jnp.asarray([[1.0], [3.0], [5.0]])
    ids = jnp.asarray([0, 0, 2])
    out = np.asarray(segment_mean(data, ids, 3))
    np.testing.assert_allclose(out[:, 0], [2.0, 0.0, 5.0])


def test_preprocess_undirected_selfloops():
    edge_index = np.array([[0, 1, 2], [1, 2, 2]])
    g = preprocess_graph(edge_index, 3, undirected=True, self_loops=True)
    src = np.asarray(g.edge_src)
    dst = np.asarray(g.edge_dst)
    pairs = set(zip(src.tolist(), dst.tolist()))
    # symmetrized + self-loops for every node
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (1, 2) in pairs and (2, 1) in pairs
    assert all((i, i) in pairs for i in range(3))
    # dst-sorted
    assert np.all(np.diff(dst) >= 0)
    # indptr consistent
    indptr = np.asarray(g.indptr)
    assert indptr[-1] == g.num_edges
    np.testing.assert_array_equal(np.diff(indptr), np.bincount(dst, minlength=3))


def test_sddmm_matches_dense():
    from sgformer_tpu.ops.sddmm import sddmm, sddmm_softmax_weights

    rng = np.random.default_rng(5)
    n, d, e = 40, 8, 150
    q = rng.standard_normal((n, d)).astype(np.float32)
    k = rng.standard_normal((n, d)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = np.sort(rng.integers(0, n, e))
    got = np.asarray(sddmm(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(src), jnp.asarray(dst)))
    want = np.einsum("ed,ed->e", q[dst], k[src])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    w = np.asarray(sddmm_softmax_weights(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(src), jnp.asarray(dst), n
    ))
    sums = np.zeros(n)
    np.add.at(sums, dst, w)
    has = np.bincount(dst, minlength=n) > 0
    np.testing.assert_allclose(sums[has], 1.0, rtol=1e-5)
