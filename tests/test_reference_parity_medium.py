"""Cross-implementation parity for the medium tier: the full medium
SGFormer (alpha-residual TransConv + injected GCN backbone,
``medium/ours.py:179-223`` + ``medium/models.py:14-63``) and H2GCN
(``medium/models.py:229-340``), executing the reference's own files under
``reference_shim`` — including the real ``medium/models.py`` loaded as the
``models`` module that ``medium/ours.py`` imports.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_shim import REFERENCE_ROOT, load_reference  # noqa: E402

if not REFERENCE_ROOT.exists():  # pragma: no cover
    pytest.skip("no reference checkout", allow_module_level=True)

from sgformer_tpu.graph import Graph, preprocess_graph  # noqa: E402
from sgformer_tpu.nn import SGFormer, SGFormerConfig  # noqa: E402
from sgformer_tpu.nn.baselines import H2GCN  # noqa: E402


@pytest.fixture(scope="module")
def ref_medium():
    """Load medium/models.py AS ``models`` so medium/ours.py's
    ``from models import GCN`` resolves to the real reference backbone."""
    models = load_reference("medium/models.py", "models")
    ours = load_reference("medium/ours.py", "ref_medium_ours")
    yield types.SimpleNamespace(models=models, ours=ours)
    sys.modules.pop("models", None)


@pytest.fixture(scope="module")
def gx():
    rng = np.random.default_rng(31)
    n, f = 44, 10
    edge_index = np.stack(
        [rng.integers(0, n, 150), rng.integers(0, n, 150)]
    ).astype(np.int64)
    g = preprocess_graph(edge_index, n, with_pyg_norm=True)
    x = rng.standard_normal((n, f)).astype(np.float32)
    return g, x


def _t(a):
    return torch.tensor(np.asarray(a))


def _lin(mod):
    return {
        "kernel": jnp.array(mod.weight.detach().numpy().T),
        "bias": jnp.array(mod.bias.detach().numpy()),
    }


def _ln(mod):
    return {
        "scale": jnp.array(mod.weight.detach().numpy()),
        "bias": jnp.array(mod.bias.detach().numpy()),
    }


def _bn(mod):
    return (
        _ln(mod),
        {
            "mean": jnp.array(mod.running_mean.detach().numpy()),
            "var": jnp.array(mod.running_var.detach().numpy()),
        },
    )


def _data(g, x):
    return types.SimpleNamespace(
        graph={
            "num_nodes": x.shape[0],
            "edge_index": _t(np.asarray(g.edge_index)),
            "node_feat": _t(x),
        }
    )


def test_medium_sgformer_full_model_parity(ref_medium, gx):
    """The medium-tier model END TO END: alpha-blended TransConv branch +
    the real medium GCN backbone (PyG GCNConv path) + fusion head, exactly
    as medium/parse.py:97-101 wires it."""
    g, x = gx
    hidden, classes = 12, 5
    trans_layers, gnn_layers, heads = 2, 2, 1

    gnn = ref_medium.models.GCN(
        x.shape[1], hidden, hidden, num_layers=gnn_layers, dropout=0.0,
        save_mem=False, use_bn=True,
    )
    tm = ref_medium.ours.SGFormer(
        x.shape[1], hidden, classes, num_layers=trans_layers,
        num_heads=heads, alpha=0.4, dropout=0.0, use_bn=True,
        use_residual=True, use_weight=True, use_graph=True,
        graph_weight=0.7, gnn=gnn, aggregate="add",
    )
    tm.eval()
    with torch.no_grad():
        want = tm(_data(g, x)).numpy()

    cfg = SGFormerConfig.medium(
        hidden, classes, trans_num_layers=trans_layers,
        trans_num_heads=heads, trans_dropout=0.0, gnn_num_layers=gnn_layers,
        gnn_dropout=0.0, alpha=0.4, graph_weight=0.7,
    )
    model = SGFormer(cfg)

    tc = tm.trans_conv
    trans = {"fc_in": _lin(tc.fcs[0]), "ln_in": _ln(tc.bns[0])}
    for i in range(trans_layers):
        conv = tc.convs[i]
        trans[f"conv_{i}"] = {
            "Wq": _lin(conv.Wq), "Wk": _lin(conv.Wk), "Wv": _lin(conv.Wv)
        }
        trans[f"ln_{i}"] = _ln(tc.bns[i + 1])
    gcn_p, gcn_s = {}, {}
    for i, conv in enumerate(gnn.convs):
        gcn_p[f"conv_{i}"] = {
            "kernel": jnp.array(conv.weight.detach().numpy()),
            "bias": jnp.array(conv.bias.detach().numpy()),
        }
    for i, bn in enumerate(gnn.bns):
        gcn_p[f"bn_{i}"], gcn_s[f"bn_{i}"] = _bn(bn)
    variables = {
        "params": {"trans_conv": trans, "gcn": gcn_p, "fc": _lin(tm.fc)},
        "batch_stats": {"gcn": gcn_s},
    }
    got = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_h2gcn_parity_with_injected_neighborhoods(ref_medium, gx):
    """H2GCN downstream math (embed → per-round [A1 h, A2 h] concat →
    jump-concat → bias-free softmax classifier) matches the reference when
    both sides use the SAME A1/A2 edge sets — the reference's normalized
    tensors are read back out of ``_prepare_prop`` and our Graphs are
    rebuilt from their patterns (both sides then apply symmetric DAD)."""
    g, x = gx
    n = x.shape[0]
    hidden, classes, k = 8, 4, 2
    tm = ref_medium.models.H2GCN(x.shape[1], hidden, classes, k=k, dropout=0.0)
    tm.eval()
    with torch.no_grad():
        want = tm(_data(g, x)).numpy()

    def graph_of(sp):
        sp = sp.coalesce()
        idx = sp.indices().numpy()
        keep = sp.values().numpy() > 0  # the indicator KEEPS explicit zeros
        ei = np.stack([idx[1][keep], idx[0][keep]])  # (row,col) → (src,dst)
        return preprocess_graph(ei, n, undirected=False, self_loops=False)

    a1, a2 = graph_of(tm.a1), graph_of(tm.a2)
    model = H2GCN(hidden, classes, num_layers=k, dropout=0.0)
    params = {
        "w_embed": jnp.array(tm.w_embed.detach().numpy()),
        "w_classify": jnp.array(tm.w_classify.detach().numpy()),
    }
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x), g, train=False,
            h2_graphs=(a1, a2),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_h2gcn_reference_a2_quirk(ref_medium, gx):
    """Pins the reference A2 quirk (SURVEY.md §8): ``indicator(A²−A−I)``
    subtracts sparse VALUES, so on the self-loop-augmented input the
    reference A2 keeps the diagonal and 1-hop pairs; ``build_h2_graphs``
    implements the exact 2-hop set instead."""
    from sgformer_tpu.graph import build_h2_graphs

    g, x = gx
    n = x.shape[0]
    tm = ref_medium.models.H2GCN(x.shape[1], 8, 4, k=2, dropout=0.0)
    tm._prepare_prop(_t(np.asarray(g.edge_index)), n)
    ref_a2 = set(
        zip(*tm.a2.coalesce().indices().numpy().tolist())
    )
    assert any(i == j for i, j in ref_a2), "reference A2 keeps the diagonal"

    _, ours_a2 = build_h2_graphs(np.asarray(g.edge_index), n)
    ours_pairs = set(
        zip(np.asarray(ours_a2.edge_dst).tolist(),
            np.asarray(ours_a2.edge_src).tolist())
    )
    assert not any(i == j for i, j in ours_pairs), "ours is self-loop-free"
    # and ours excludes 1-hop pairs by construction
    one_hop = set(
        zip(np.asarray(g.edge_dst).tolist(), np.asarray(g.edge_src).tolist())
    )
    assert not (ours_pairs & one_hop)


def test_graphtrans_parity(gx):
    """GraphTrans (GCN encoder → torch TransformerEncoder → head,
    ``medium/graphtrans.py``) vs ours, mapping torch's packed
    in_proj/out_proj multihead attention onto flax's per-projection
    kernels."""
    from sgformer_tpu.nn.graphtrans import GraphTrans

    ref_gt = load_reference("medium/graphtrans.py", "ref_graphtrans")
    g, x = gx
    classes, hidden, emb, d_model, heads, tlayers = 4, 12, 8, 8, 2, 2
    tm = ref_gt.graphTrans(
        x.shape[1], hidden, classes, gnn_emb_dim=emb, d_model=d_model,
        num_layers=2, num_trans_layers=tlayers, num_trans_head=heads,
        dim_feedforward=16, dropout=0.0, trans_dropout=0.0,
    )
    tm.eval()
    with torch.no_grad():
        want = tm(_data(g, x)).numpy()

    hd = d_model // heads

    def map_mha(mha):
        w = mha.in_proj_weight.detach().numpy()  # [3d, d]
        b = mha.in_proj_bias.detach().numpy()
        d = d_model
        out = {}
        for i, name in enumerate(("query", "key", "value")):
            out[name] = {
                "kernel": jnp.array(
                    w[i * d:(i + 1) * d].T.reshape(d, heads, hd)
                ),
                "bias": jnp.array(b[i * d:(i + 1) * d].reshape(heads, hd)),
            }
        out["out"] = {
            "kernel": jnp.array(
                mha.out_proj.weight.detach().numpy().T.reshape(heads, hd, d)
            ),
            "bias": jnp.array(mha.out_proj.bias.detach().numpy()),
        }
        return out

    gnn_p, gnn_s = {}, {}
    for i, conv in enumerate(tm.gnn.convs):
        gnn_p[f"conv_{i}"] = {
            "kernel": jnp.array(conv.weight.detach().numpy()),
            "bias": jnp.array(conv.bias.detach().numpy()),
        }
    for i, bn in enumerate(tm.gnn.bns):
        gnn_p[f"bn_{i}"], gnn_s[f"bn_{i}"] = _bn(bn)
    params = {
        "gnn": gnn_p,
        "gnn2transformer": _lin(tm.trans.gnn2transformer),
        "input_ln": _ln(tm.trans.input_layernorm),
        "final_ln": _ln(tm.trans.transformer.norm),
        "output": _lin(tm.trans.output),
    }
    for i, layer in enumerate(tm.trans.transformer.layers):
        params[f"layer_{i}"] = {
            "self_attn": map_mha(layer.self_attn),
            "norm1": _ln(layer.norm1),
            "norm2": _ln(layer.norm2),
            "linear1": _lin(layer.linear1),
            "linear2": _lin(layer.linear2),
        }
    model = GraphTrans(
        hidden, classes, gnn_emb_dim=emb, d_model=d_model, num_layers=2,
        num_trans_layers=tlayers, num_trans_head=heads, dim_feedforward=16,
        dropout=0.0, trans_dropout=0.0,
    )
    got = np.asarray(
        model.apply(
            {"params": params, "batch_stats": {"gnn": gnn_s}},
            jnp.asarray(x), g, train=False,
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
