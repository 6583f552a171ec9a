"""Baseline zoo: shape/grad sanity for every model, oracle checks for the
analytic ones (SGC, APPNP, LINK, edge_softmax/GAT normalization), and a
trainer smoke-run across all of them."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.graph import build_h2_graphs, preprocess_graph
from sgformer_tpu.nn import (
    APPNP,
    GAT,
    GATJK,
    GCNJK,
    GPRGNN,
    H2GCN,
    LINK,
    MLP,
    SGC,
    SGC2,
    SIGN,
    MixHop,
    MultiLP,
)
from sgformer_tpu.ops.spmm import edge_softmax

import reference_numpy as ref


N, F, C = 60, 12, 4


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(8)
    edge_index = ref.random_graph(rng, N, 300)
    g = preprocess_graph(edge_index, N, with_pyg_norm=True)
    x = rng.standard_normal((N, F)).astype(np.float32)
    label = rng.integers(0, C, N)
    return g, x, label, edge_index


MODELS = {
    "mlp": lambda: MLP(16, C),
    "sgc": lambda: SGC(C, hops=2),
    "sgc2": lambda: SGC2(16, C, hops=2),
    "sign": lambda: SIGN(16, C, hops=2),
    "gat": lambda: GAT(8, C, heads=2),
    "mixhop": lambda: MixHop(16, C, hops=2),
    "gcnjk": lambda: GCNJK(16, C),
    "gatjk": lambda: GATJK(8, C, heads=2),
    "appnp": lambda: APPNP(16, C, K=4),
    "gprgnn": lambda: GPRGNN(16, C, K=4),
    "link": lambda: LINK(N, C),
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_baseline_forward_and_grad(problem, name):
    g, x, label, _ = problem
    model = MODELS[name]()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False
    )
    out = model.apply(variables, jnp.asarray(x), g, train=False)
    assert out.shape == (N, C)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        logits, mut = model.apply(
            {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
            jnp.asarray(x), g, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        return (logits ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_sgc_oracle(problem):
    """SGC == A_norm² x W with the dense adjacency oracle."""
    g, x, label, _ = problem
    model = SGC(C, hops=2)
    variables = model.init(jax.random.PRNGKey(2), jnp.asarray(x), g, train=False)
    got = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    adj = ref.gcn_adj_dense(np.asarray(g.edge_src), np.asarray(g.edge_dst), N)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    want = (adj @ (adj @ x.astype(np.float64))) @ p["lin"]["kernel"] + p["lin"]["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_appnp_oracle(problem):
    g, x, label, _ = problem
    model = APPNP(16, C, K=3, alpha=0.2, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x), g, train=False)
    got = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    adj = ref.gcn_adj_dense(np.asarray(g.edge_src), np.asarray(g.edge_dst), N)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    h = np.maximum(x.astype(np.float64) @ p["lin1"]["kernel"] + p["lin1"]["bias"], 0)
    h = h @ p["lin2"]["kernel"] + p["lin2"]["bias"]
    z = h.copy()
    for _ in range(3):
        z = 0.8 * (adj @ z) + 0.2 * h
    np.testing.assert_allclose(got, z, rtol=1e-4, atol=1e-5)


def test_edge_softmax_sums_to_one(problem):
    g, _, _, _ = problem
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((g.num_edges, 2)).astype(np.float32))
    w = np.asarray(edge_softmax(scores, g.edge_dst, g.num_nodes))
    sums = np.zeros((g.num_nodes, 2))
    np.add.at(sums, np.asarray(g.edge_dst), w)
    has_edge = np.bincount(np.asarray(g.edge_dst), minlength=g.num_nodes) > 0
    np.testing.assert_allclose(sums[has_edge], 1.0, rtol=1e-5)


def test_h2gcn_forward(problem):
    g, x, label, edge_index = problem
    a1, a2 = build_h2_graphs(edge_index, N)
    # A2 must be the exact 2-hop set: no overlap with A1, no self loops
    e1 = set(zip(np.asarray(a1.edge_src).tolist(), np.asarray(a1.edge_dst).tolist()))
    e2 = set(zip(np.asarray(a2.edge_src).tolist(), np.asarray(a2.edge_dst).tolist()))
    assert not (e1 & e2)
    assert all(s != d for s, d in e2)
    model = H2GCN(16, C)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.asarray(x), g, train=False, h2_graphs=(a1, a2)
    )
    out = model.apply(
        variables, jnp.asarray(x), g, train=False, h2_graphs=(a1, a2)
    )
    assert out.shape == (N, C)
    assert np.all(np.isfinite(np.asarray(out)))


def test_multilp_predicts(problem):
    g, x, label, _ = problem
    lp = MultiLP(C, alpha=0.5, hops=1, num_iters=20)
    train_idx = np.arange(0, N, 2)
    z = np.asarray(lp.predict(g, label, train_idx))
    assert z.shape == (N, C)
    # clamped train labels survive propagation
    assert (z[train_idx].argmax(1) == label[train_idx]).mean() == 1.0


def test_baselines_in_trainer(problem):
    """Every nn-module baseline runs a few Trainer epochs without error."""
    from sgformer_tpu.train import TrainConfig, Trainer

    g, x, label, _ = problem
    split = {
        "train": np.arange(0, N, 2),
        "valid": np.arange(1, N, 4),
        "test": np.arange(3, N, 4),
    }
    for name in ("mlp", "sgc", "gat", "appnp"):
        model = MODELS[name]()
        tc = TrainConfig(lr=0.01, epochs=3, eval_step=2, display_step=-1)
        trainer = Trainer(model, g, x, label.reshape(-1, 1), tc)
        logger = trainer.fit([split])
        assert logger.results[0], name


def test_gat_chunked_matches_xla(problem):
    """GAT with the runtime-weighted MXU kernel == segment-sum path."""
    g_plain, x, label, edge_index = problem
    g_chunk = preprocess_graph(
        edge_index, N, with_pyg_norm=True, with_chunks=True, chunk_perm=True,
        chunk_edges=128, window_rows=64, chunk_dtype="f32",
        chunk_interpret=True,
    )
    model = GAT(8, C, heads=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), g_plain,
                           train=False)
    want = np.asarray(model.apply(variables, jnp.asarray(x), g_plain,
                                  train=False))
    got = np.asarray(model.apply(variables, jnp.asarray(x), g_chunk,
                                 train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss(p, gg):
        out = model.apply(
            {"params": p,
             **{k: v for k, v in variables.items() if k != "params"}},
            jnp.asarray(x), gg, train=False,
        )
        return (out ** 2).mean()

    gw = jax.grad(loss)(variables["params"], g_plain)
    gc = jax.grad(loss)(variables["params"], g_chunk)
    for a, b in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_multilp_mult_bin(problem):
    """mult_bin: per-task 2-way propagation, positive column read-out
    (large/gnns.py:343-360)."""
    g, x, label, _ = problem
    rng = np.random.default_rng(4)
    multi = rng.integers(0, 2, (g.num_nodes, 3))
    train_idx = np.arange(0, g.num_nodes, 2)
    lp = MultiLP(3, alpha=0.5, hops=1, num_iters=10, mult_bin=True)
    out = np.asarray(lp.predict(g, multi, train_idx))
    assert out.shape == (g.num_nodes, 3)
    assert np.isfinite(out).all()
    # positive columns correlate with the seeded labels on train nodes
    acc = ((out[train_idx] > out[train_idx].mean()) ==
           (multi[train_idx] > 0)).mean()
    assert acc > 0.6
