"""Model-level parity (pinned weights vs the numpy oracle of the reference
equations) and shape/grad sanity for every SGFormer variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.nn import GCN, GraphConv, SGFormer, SGFormerConfig, TransConv

import reference_numpy as ref


def _np_params(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(7)
    n = 48
    edge_index = ref.random_graph(rng, n, 200)
    g = preprocess_graph(edge_index, n, with_pyg_norm=True)
    x = rng.standard_normal((n, 24)).astype(np.float32)
    return g, x


@pytest.mark.parametrize(
    "num_layers,heads,residual_mode,use_act",
    [(1, 1, "mean", True), (2, 2, "alpha", False), (3, 1, "alpha", False)],
)
def test_transconv_parity(small_graph, num_layers, heads, residual_mode, use_act):
    g, x = small_graph
    model = TransConv(
        hidden_channels=16,
        num_layers=num_layers,
        num_heads=heads,
        use_act=use_act,
        residual_mode=residual_mode,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    p = _np_params(variables["params"])
    # flatten nested layer params to oracle layout
    params = {"fc_in": p["fc_in"], "ln_in": p["ln_in"]}
    for i in range(num_layers):
        params[f"conv_{i}"] = p[f"conv_{i}"]
        params[f"ln_{i}"] = p[f"ln_{i}"]
    want = ref.trans_conv(
        x.astype(np.float64),
        params,
        num_layers,
        heads,
        use_act=use_act,
        residual_mode=residual_mode,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_transconv_no_weight(small_graph):
    g, x = small_graph
    model = TransConv(hidden_channels=24, num_layers=1, use_weight=False)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == (x.shape[0], 24)
    assert np.all(np.isfinite(got))


@pytest.mark.parametrize("use_init", [False, True])
def test_graphconv_parity(small_graph, use_init):
    g, x = small_graph
    model = GraphConv(hidden_channels=16, num_layers=2, use_init=use_init)
    variables = model.init(
        jax.random.PRNGKey(2), jnp.asarray(x), g, train=False
    )
    # train-mode forward (batch stats) matches torch BN train semantics;
    # dropout disabled via deterministic rng not needed at rate 0.5 — use eval
    # with explicit train BN by testing through the oracle's train path on a
    # dropout-free config instead:
    model_nodrop = GraphConv(
        hidden_channels=16, num_layers=2, use_init=use_init, dropout=0.0
    )
    got, _ = model_nodrop.apply(
        variables,
        jnp.asarray(x),
        g,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    got = np.asarray(got)

    p = _np_params(variables["params"])
    adj = ref.gcn_adj_dense(np.asarray(g.edge_src), np.asarray(g.edge_dst), g.num_nodes)
    want = ref.graph_conv(
        x.astype(np.float64), adj, p, num_layers=2, use_init=use_init, train=True
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_gcn_backbone_shapes(small_graph):
    g, x = small_graph
    model = GCN(hidden_channels=16, out_channels=5, num_layers=3)
    variables = model.init(jax.random.PRNGKey(4), jnp.asarray(x), g, train=False)
    out = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    assert out.shape == (x.shape[0], 5)
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize(
    "cfg_fn", [SGFormerConfig.medium, SGFormerConfig.large, SGFormerConfig.papers100m]
)
def test_sgformer_tiers_forward_and_grad(small_graph, cfg_fn):
    g, x = small_graph
    cfg = cfg_fn(16, 5)
    model = SGFormer(cfg)
    variables = model.init(jax.random.PRNGKey(5), jnp.asarray(x), g, train=False)
    out = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    assert out.shape == (x.shape[0], 5)
    assert np.all(np.isfinite(out))

    def loss(params):
        logits, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            jnp.asarray(x),
            g,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(6)},
        )
        return (logits**2).mean()

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # every branch receives gradient
    assert any(float(jnp.abs(l).sum()) > 0 for l in flat)


def test_sgformer_aggregate_cat(small_graph):
    g, x = small_graph
    cfg = SGFormerConfig.large(16, 5, aggregate="cat")
    model = SGFormer(cfg)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x), g, train=False)
    out = model.apply(variables, jnp.asarray(x), g, train=False)
    assert out.shape == (x.shape[0], 5)


def test_sgformer_attention_impl_pallas_and_auto(small_graph):
    """attention_impl='pallas' (fused two-pass kernel, interpret mode off
    TPU) matches 'xla' forward-exactly at f32; 'auto' — the round-2c
    default — resolves to the XLA path off the TPU bf16 combination, so
    it is bit-identical to 'xla' here."""
    g, x = small_graph
    outs = {}
    for impl in ("xla", "pallas", "auto"):
        cfg = SGFormerConfig.large(16, 5, attention_impl=impl)
        model = SGFormer(cfg)
        variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x), g,
                               train=False)
        outs[impl] = np.asarray(
            model.apply(variables, jnp.asarray(x), g, train=False)
        )
    np.testing.assert_allclose(outs["pallas"], outs["xla"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(outs["auto"], outs["xla"])


def test_sgformer_attention_maps(small_graph):
    g, x = small_graph
    cfg = SGFormerConfig.medium(16, 5, trans_num_layers=2)
    model = SGFormer(cfg)
    variables = model.init(jax.random.PRNGKey(8), jnp.asarray(x), g, train=False)
    attns = model.apply(
        variables, jnp.asarray(x), method=SGFormer.get_attentions
    )
    assert attns.shape == (2, x.shape[0], x.shape[0])


def test_sgformer_remat_matches_plain(small_graph):
    """remat trades FLOPs for memory without changing values or grads."""
    g, x = small_graph
    cfg = SGFormerConfig(16, 5, gnn="graphconv", trans_dropout=0.0,
                         gnn_dropout=0.0)
    cfg_r = SGFormerConfig(16, 5, gnn="graphconv", trans_dropout=0.0,
                           gnn_dropout=0.0, remat=True)
    model, model_r = SGFormer(cfg), SGFormer(cfg_r)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), g,
                           train=False)
    out = model.apply(variables, jnp.asarray(x), g, train=False)
    out_r = model_r.apply(variables, jnp.asarray(x), g, train=False)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out),
                               rtol=1e-6, atol=1e-6)

    def loss(m, p):
        logits, _ = m.apply(
            {"params": p, **{k: v for k, v in variables.items()
                             if k != "params"}},
            jnp.asarray(x), g, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        return (logits ** 2).mean()

    gw = jax.grad(lambda p: loss(model, p))(variables["params"])
    gr = jax.grad(lambda p: loss(model_r, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_sgformer_remat_with_pallas_chunks(small_graph):
    """remat composes with the chunked (pallas) aggregation path — the
    kernels' custom_vjps take the plan as an argument, not a closure, so
    re-tracing transforms don't leak tracers."""
    import reference_numpy as _ref

    rng = np.random.default_rng(21)
    n = 80
    edge_index = _ref.random_graph(rng, n, 400)
    g = preprocess_graph(edge_index, n, with_chunks=True, chunk_edges=128,
                         window_rows=64, chunk_dtype="f32",
                         chunk_interpret=True)
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    cfg = SGFormerConfig(16, 4, gnn="graphconv", remat=True,
                         trans_dropout=0.0, gnn_dropout=0.0)
    model = SGFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, g, train=False)

    def loss(p):
        logits, _ = model.apply(
            {"params": p, **{k: v for k, v in variables.items()
                             if k != "params"}},
            x, g, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        return (logits ** 2).mean()

    grads = jax.jit(jax.grad(loss))(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))


def test_fast_dropout_statistics_and_scaling():
    """nn/layers.py::Dropout draws 8-bit masks for rates on the 1/256
    grid: Bernoulli(keep) statistics, 1/keep scaling, zeros elsewhere,
    deterministic pass-through."""
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.nn.layers import Dropout

    x = jnp.ones((4000, 64), jnp.float32)
    y = Dropout(0.5, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(0)}
    )
    y = np.asarray(y)
    kept = y != 0.0
    assert np.allclose(y[kept], 2.0)  # 1/keep scaling
    frac = kept.mean()
    assert 0.48 < frac < 0.52  # ~Bernoulli(0.5) over 256K draws

    # off-grid rate falls back to exact bernoulli; still correct scaling
    y2 = np.asarray(Dropout(1 / 3, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(1)}
    ))
    kept2 = y2 != 0.0
    assert np.allclose(y2[kept2], 1.5)
    assert 0.63 < kept2.mean() < 0.70

    # deterministic / rate-0 pass through unchanged
    z = Dropout(0.5, deterministic=True).apply({}, x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    z0 = Dropout(0.0, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(x))
