"""DIFFormer / NodeFormer / GraphTrans / GraphGPS: forward+grad sanity,
DIFFormer kernel oracles, NodeFormer link-loss training integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.nn import (
    DIFFormer,
    GraphGPS,
    GraphTrans,
    NodeFormer,
    build_nodeformer_adjs,
)
from sgformer_tpu.nn.difformer import difformer_attention

import reference_numpy as ref

N, F, C = 50, 10, 4


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(12)
    edge_index = ref.random_graph(rng, N, 250)
    g = preprocess_graph(edge_index, N, with_pyg_norm=True)
    x = rng.standard_normal((N, F)).astype(np.float32)
    label = rng.integers(0, C, N).reshape(-1, 1)
    return g, x, label, edge_index


def test_difformer_simple_kernel_oracle():
    rng = np.random.default_rng(1)
    qs = rng.standard_normal((12, 2, 6)).astype(np.float32)
    ks = rng.standard_normal((12, 2, 6)).astype(np.float32)
    vs = rng.standard_normal((12, 2, 6)).astype(np.float32)
    got = np.asarray(difformer_attention(jnp.asarray(qs), jnp.asarray(ks), jnp.asarray(vs), "simple"))
    qn = qs / np.linalg.norm(qs.ravel())
    kn = ks / np.linalg.norm(ks.ravel())
    num = np.einsum("nhm,hmd->nhd", qn, np.einsum("lhm,lhd->hmd", kn, vs)) + vs.sum(0)
    den = np.einsum("nhm,hm->nh", qn, kn.sum(0))[..., None] + 12
    np.testing.assert_allclose(got, num / den, rtol=1e-4, atol=1e-5)


def test_difformer_sigmoid_kernel_rows_normalized():
    rng = np.random.default_rng(2)
    qs = jnp.asarray(rng.standard_normal((10, 1, 4)).astype(np.float32))
    out, attn = difformer_attention(qs, qs, qs, "sigmoid", output_attn=True)
    np.testing.assert_allclose(np.asarray(attn).sum(1), 1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "make",
    [
        lambda: DIFFormer(16, C, num_layers=2),
        lambda: DIFFormer(16, C, kernel="sigmoid", graph_weight=0.5),
        lambda: GraphTrans(16, C, gnn_emb_dim=16, d_model=16,
                           num_trans_layers=2, num_trans_head=2,
                           dim_feedforward=32),
        lambda: GraphGPS(16, C, num_layers=2, num_heads=2),
    ],
)
def test_transformer_baselines_forward_grad(problem, make):
    g, x, label, _ = problem
    model = make()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), g, train=False)
    out = model.apply(variables, jnp.asarray(x), g, train=False)
    assert out.shape == (N, C)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        logits, _ = model.apply(
            {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
            jnp.asarray(x), g, train=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "performer": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return (logits ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))


def test_nodeformer_forward_and_link_loss(problem):
    g, x, label, edge_index = problem
    adjs = build_nodeformer_adjs(edge_index, N, rb_order=2)
    model = NodeFormer(16, C, num_layers=2, num_heads=2, rb_order=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False, adjs=adjs
    )
    out, lls = model.apply(variables, jnp.asarray(x), g, train=False, adjs=adjs)
    assert out.shape == (N, C)
    assert len(lls) == 2
    assert all(np.isfinite(float(l)) for l in lls)
    # gumbel path under train
    out2, _ = model.apply(
        variables, jnp.asarray(x), g, train=True, adjs=adjs,
        rngs={"dropout": jax.random.PRNGKey(1), "performer": jax.random.PRNGKey(2)},
    )
    assert np.all(np.isfinite(np.asarray(out2)))


def test_nodeformer_trains_with_link_loss(problem):
    from sgformer_tpu.train import TrainConfig, Trainer

    g, x, label, edge_index = problem
    adjs = build_nodeformer_adjs(edge_index, N, rb_order=2)
    model = NodeFormer(16, C, num_layers=1, num_heads=2, rb_order=2,
                       nb_gumbel_sample=4)
    tc = TrainConfig(lr=0.01, epochs=3, eval_step=2, display_step=-1, lamda=0.5)
    trainer = Trainer(model, g, x, label, tc, model_kwargs={"adjs": adjs})
    split = {"train": np.arange(0, N, 2), "valid": np.arange(1, N, 4),
             "test": np.arange(3, N, 4)}
    logger = trainer.fit([split])
    assert logger.results[0]


def test_graphormer_forward_and_train(problem):
    from sgformer_tpu.nn import Graphormer, graphormer_inputs
    from sgformer_tpu.train import TrainConfig, Trainer

    g, x, label, edge_index = problem
    inputs = graphormer_inputs(edge_index, (x > 0).astype(np.int64), N)
    assert inputs["spatial_pos"].shape == (N, N)
    model = Graphormer(C, embed_dim=32, num_layers=2, num_heads=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False, inputs=inputs
    )
    out = model.apply(variables, jnp.asarray(x), g, train=False, inputs=inputs)
    assert out.shape == (N, C)
    assert np.all(np.isfinite(np.asarray(out)))

    tc = TrainConfig(lr=0.01, epochs=3, eval_step=2, display_step=-1)
    trainer = Trainer(model, g, x, label, tc, model_kwargs={"inputs": inputs})
    split = {"train": np.arange(0, N, 2), "valid": np.arange(1, N, 4),
             "test": np.arange(3, N, 4)}
    logger = trainer.fit([split])
    assert logger.results[0]


def test_graphormer_random_spatial_stub(problem):
    """The reference's random spatial_pos behavior stays available."""
    from sgformer_tpu.nn import graphormer_inputs

    g, x, label, edge_index = problem
    inputs = graphormer_inputs(
        edge_index, (x > 0).astype(np.int64), N, spatial="random", seed=1
    )
    assert inputs["spatial_pos"].max() < 1000


def test_difformer_attention_maps(problem):
    g, x, label, _ = problem
    model = DIFFormer(16, C, num_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), g, train=False)
    out, attns = model.apply(
        variables, jnp.asarray(x), g, train=False, output_attn=True
    )
    assert attns.shape == (2, N, N)
    assert np.all(np.isfinite(np.asarray(attns)))


def test_nodeformer_jk(problem):
    g, x, label, edge_index = problem
    adjs = build_nodeformer_adjs(edge_index, N, rb_order=1)
    model = NodeFormer(16, C, num_layers=2, num_heads=2, rb_order=1,
                       use_jk=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), g,
                           train=False, adjs=adjs)
    out, _ = model.apply(variables, jnp.asarray(x), g, train=False, adjs=adjs)
    assert out.shape == (N, C)


def test_graphormer_layerdrop_and_quant_noise(problem):
    """LayerDrop skips layers stochastically at train time only; quant
    noise perturbs train-time outputs; eval is unaffected by both."""
    from sgformer_tpu.nn import Graphormer, graphormer_inputs

    g, x, label, edge_index = problem
    inputs = graphormer_inputs(edge_index, (x > 0).astype(np.int64), N)
    base = Graphormer(C, embed_dim=32, num_layers=2, num_heads=2)
    reg = Graphormer(C, embed_dim=32, num_layers=2, num_heads=2,
                     layerdrop=0.5, q_noise=0.3, qn_block_size=8)
    variables = base.init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False, inputs=inputs
    )
    # eval: regularizers off -> identical to the plain model
    out_base = base.apply(variables, jnp.asarray(x), g, train=False,
                          inputs=inputs)
    out_reg = reg.apply(variables, jnp.asarray(x), g, train=False,
                        inputs=inputs)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_reg),
                               rtol=1e-6)
    # train: two rngs give different outputs (stochastic regularization)
    outs = [
        np.asarray(reg.apply(
            variables, jnp.asarray(x), g, train=True, inputs=inputs,
            rngs={"dropout": jax.random.PRNGKey(s),
                  "layerdrop": jax.random.PRNGKey(100 + s),
                  "quant_noise": jax.random.PRNGKey(200 + s)},
        ))
        for s in (0, 1)
    ]
    assert not np.allclose(outs[0], outs[1])
    assert all(np.all(np.isfinite(o)) for o in outs)


def test_graphormer_edge_bias_and_virtual_distance(problem):
    from sgformer_tpu.nn import Graphormer, graphormer_inputs

    g, x, label, edge_index = problem
    inputs = dict(graphormer_inputs(edge_index, (x > 0).astype(np.int64), N))
    # dense per-pair edge-type ids (0 = no edge), [N, N, 1]
    aet = np.zeros((N, N, 1), dtype=np.int64)
    src, dst = edge_index
    aet[src, dst, 0] = 1 + (np.arange(len(src)) % 7)
    inputs["attn_edge_type"] = aet
    model = Graphormer(C, embed_dim=32, num_layers=1, num_heads=2,
                       use_edge_bias=True, use_virtual_distance=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False, inputs=inputs
    )
    assert "edge_encoder" in variables["params"]
    assert "graph_token_virtual_distance" in variables["params"]
    out = model.apply(variables, jnp.asarray(x), g, train=False, inputs=inputs)
    assert out.shape == (N, C)
    assert np.all(np.isfinite(np.asarray(out)))


def test_graphormer_collated_batch_matches_unpadded(problem):
    """Padded multi-graph batching: a graph's logits are identical whether
    it is padded inside a mixed-size batch or batched alone unpadded
    (the -inf attn_bias masks padding out of every softmax)."""
    from sgformer_tpu.nn import Graphormer, graphormer_inputs
    from sgformer_tpu.nn.graphormer import collate_graphs

    g, x, label, edge_index = problem
    rng = np.random.default_rng(3)
    n1, n2 = 20, 13
    e1 = ref.random_graph(rng, n1, 60)
    e2 = ref.random_graph(rng, n2, 40)
    f1 = (rng.standard_normal((n1, F)) > 0).astype(np.int64)
    f2 = (rng.standard_normal((n2, F)) > 0).astype(np.int64)
    g1 = graphormer_inputs(e1, f1, n1)
    g2 = graphormer_inputs(e2, f2, n2)

    batch = collate_graphs([g1, g2])
    assert batch["x"].shape == (2, n1, F)
    assert batch["node_mask"].sum() == n1 + n2

    model = Graphormer(C, embed_dim=32, num_layers=2, num_heads=2)
    variables = model.init(
        jax.random.PRNGKey(0), None, None, train=False, inputs=batch
    )
    out = model.apply(variables, None, None, train=False, inputs=batch)
    assert out.shape == (2, n1, C)

    solo = collate_graphs([g2])  # n2-sized, no padding
    out_solo = model.apply(variables, None, None, train=False, inputs=solo)
    np.testing.assert_allclose(
        np.asarray(out[1, :n2]), np.asarray(out_solo[0]), rtol=2e-4, atol=2e-5
    )
