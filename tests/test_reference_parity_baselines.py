"""Cross-implementation parity for the baseline zoo: our flax models vs
the reference's ``large/gnns.py`` executing unmodified under the
``reference_shim`` PyG/torch_sparse stand-ins.

Covers MLP, LINK, SGC, SGCMem, SGC2, SIGN, MixHop, GCN, GCNJK (cat+max),
APPNP, GPRGNN, the parameter-free MultiLP (plain + mult_bin), and — since
round 4's faithful GATConv shim — GAT and GATJK (cat+max) with copied
weights, completing cross-implementation coverage of the zoo.

All graphs are canonically preprocessed (undirected + exactly one
self-loop per node), where our in-degree DAD weights coincide with PyG
``gcn_norm`` — the normalization identity the framework relies on.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_shim import REFERENCE_ROOT, load_reference  # noqa: E402

if not REFERENCE_ROOT.exists():  # pragma: no cover
    pytest.skip("no reference checkout", allow_module_level=True)

from sgformer_tpu.graph import preprocess_graph  # noqa: E402
from sgformer_tpu.nn import baselines as B  # noqa: E402
from sgformer_tpu.nn.gcn import GCN  # noqa: E402


@pytest.fixture(scope="module")
def gnns():
    return load_reference("large/gnns.py", "ref_gnns")


@pytest.fixture(scope="module")
def gx():
    rng = np.random.default_rng(21)
    n, f = 50, 12
    edge_index = np.stack(
        [rng.integers(0, n, 180), rng.integers(0, n, 180)]
    ).astype(np.int64)
    g = preprocess_graph(edge_index, n, with_pyg_norm=True)
    x = rng.standard_normal((n, f)).astype(np.float32)
    return g, x


N_CLASSES, HIDDEN = 4, 16


def _t(a):
    return torch.tensor(np.asarray(a))


def _lin(mod):
    return {
        "kernel": jnp.array(mod.weight.detach().numpy().T),
        "bias": jnp.array(mod.bias.detach().numpy()),
    }


def _bn(mod):
    return (
        {
            "scale": jnp.array(mod.weight.detach().numpy()),
            "bias": jnp.array(mod.bias.detach().numpy()),
        },
        {
            "mean": jnp.array(mod.running_mean.detach().numpy()),
            "var": jnp.array(mod.running_var.detach().numpy()),
        },
    )


def _apply(model, variables, x, g, **kw):
    return np.asarray(model.apply(variables, jnp.asarray(x), g, **kw))


def _ref_out(tmodel, x, g):
    tmodel.eval()
    with torch.no_grad():
        return tmodel(_t(x), _t(np.asarray(g.edge_index))).numpy()


def _vars(params, stats=None):
    v = {"params": params}
    if stats:
        v["batch_stats"] = stats
    return v


def test_mlp_parity(gnns, gx):
    g, x = gx
    tm = gnns.MLP(x.shape[1], HIDDEN, N_CLASSES, num_layers=3, dropout=0.0)
    params, stats = {}, {}
    for i, lin in enumerate(tm.lins):
        params[f"lin_{i}"] = _lin(lin)
    for i, bn in enumerate(tm.bns):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    model = B.MLP(HIDDEN, N_CLASSES, num_layers=3, dropout=0.0)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_link_parity(gnns, gx):
    g, x = gx
    n = x.shape[0]
    tm = gnns.LINK(n, N_CLASSES)
    params = {
        "weight": jnp.array(tm.W.weight.detach().numpy().T),
        "bias": jnp.array(tm.W.bias.detach().numpy()),
    }
    got = _apply(B.LINK(n, N_CLASSES), _vars(params), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_sgc_parity(gnns, gx):
    g, x = gx
    tm = gnns.SGC(x.shape[1], N_CLASSES, hops=2)
    params = {"lin": _lin(tm.conv.lin)}
    got = _apply(B.SGC(N_CLASSES, hops=2), _vars(params), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_sgcmem_parity(gnns, gx):
    g, x = gx
    tm = gnns.SGCMem(x.shape[1], N_CLASSES, hops=3)
    params = {"lin": _lin(tm.lin)}
    got = _apply(B.SGCMem(N_CLASSES, hops=3), _vars(params), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_sgc2_parity(gnns, gx):
    g, x = gx
    tm = gnns.SGC2(x.shape[1], HIDDEN, N_CLASSES, hops=2, num_layers=3,
                   dropout=0.0, use_bn=True)
    mlp_p, mlp_s = {}, {}
    for i, lin in enumerate(tm.lins):
        mlp_p[f"lin_{i}"] = _lin(lin)
    for i, bn in enumerate(tm.bns[: len(tm.lins) - 1]):
        mlp_p[f"bn_{i}"], mlp_s[f"bn_{i}"] = _bn(bn)
    model = B.SGC2(HIDDEN, N_CLASSES, hops=2, num_layers=3, dropout=0.0,
                   use_bn=True)
    got = _apply(model, _vars({"mlp": mlp_p}, {"mlp": mlp_s}), x, g,
                 train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_sign_parity(gnns, gx):
    g, x = gx
    hops, f = 2, x.shape[1]
    tm = gnns.SIGN(f, HIDDEN, N_CLASSES, hops=hops, num_layers=3,
                   dropout=0.0, use_bn=True)
    params, stats = {}, {}
    w0 = tm.lins[0].weight.detach().numpy()  # [hidden, f*(hops+1)]
    b0 = tm.lins[0].bias.detach().numpy()
    for k in range(hops + 1):
        params[f"hop_{k}"] = {
            "kernel": jnp.array(w0[:, k * f:(k + 1) * f].T),
            # the reference has ONE bias on the concat projection; carry it
            # on hop_0 (the per-hop linears sum, gnns.py:262-264)
            "bias": jnp.array(b0 if k == 0 else np.zeros_like(b0)),
        }
    for i, lin in enumerate(tm.lins[1:], start=1):
        params[f"lin_{i}"] = _lin(lin)
    for i, bn in enumerate(tm.bns[: len(tm.lins) - 1]):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    model = B.SIGN(HIDDEN, N_CLASSES, hops=hops, num_layers=3, dropout=0.0,
                   use_bn=True)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_mixhop_parity(gnns, gx):
    g, x = gx
    hops = 2
    tm = gnns.MixHop(x.shape[1], HIDDEN, N_CLASSES, num_layers=3,
                     dropout=0.0, hops=hops)
    params, stats = {}, {}
    for i, conv in enumerate(tm.convs):
        entry = {}
        for j, lin in enumerate(conv.lins):
            entry[f"lin_{j}_kernel"] = jnp.array(lin.weight.detach().numpy().T)
            entry[f"lin_{j}_bias"] = jnp.array(lin.bias.detach().numpy())
        params[f"mix_{i}"] = entry
    for i, bn in enumerate(tm.bns):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    params["final"] = _lin(tm.final_project)
    model = B.MixHop(HIDDEN, N_CLASSES, num_layers=3, dropout=0.0, hops=hops)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def _map_gcnconv(conv):
    out = {"kernel": jnp.array(conv.weight.detach().numpy())}
    if conv.bias is not None:
        out["bias"] = jnp.array(conv.bias.detach().numpy())
    return out


def test_gcn_parity(gnns, gx):
    """Reference large-tier GCN with ``save_mem=False`` (normalize=True —
    the ``save_mem=True`` default propagates the RAW adjacency, a quirk
    noted in the shim GCNConv docstring)."""
    g, x = gx
    tm = gnns.GCN(x.shape[1], HIDDEN, N_CLASSES, num_layers=3, dropout=0.0,
                  save_mem=False, use_bn=True)
    params, stats = {}, {}
    for i, conv in enumerate(tm.convs):
        params[f"conv_{i}"] = _map_gcnconv(conv)
    for i, bn in enumerate(tm.bns):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    model = GCN(HIDDEN, N_CLASSES, num_layers=3, dropout=0.0, use_bn=True)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("jk_type", ["cat", "max"])
def test_gcnjk_parity(gnns, gx, jk_type):
    g, x = gx
    tm = gnns.GCNJK(x.shape[1], HIDDEN, N_CLASSES, num_layers=3,
                    dropout=0.0, jk_type=jk_type)
    params, stats = {}, {}
    for i, conv in enumerate(tm.convs):
        params[f"conv_{i}"] = _map_gcnconv(conv)
    for i, bn in enumerate(tm.bns[: len(tm.convs) - 1]):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    params["final"] = _lin(tm.final_project)
    model = B.GCNJK(HIDDEN, N_CLASSES, num_layers=3, dropout=0.0,
                    jk_type=jk_type)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_appnp_parity(gnns, gx):
    g, x = gx
    tm = gnns.APPNP_Net(x.shape[1], HIDDEN, N_CLASSES, dropout=0.0, K=5,
                        alpha=0.2)
    params = {"lin1": _lin(tm.lin1), "lin2": _lin(tm.lin2)}
    model = B.APPNP(HIDDEN, N_CLASSES, dropout=0.0, K=5, alpha=0.2)
    got = _apply(model, _vars(params), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_gprgnn_parity(gnns, gx):
    g, x = gx
    tm = gnns.GPRGNN(x.shape[1], HIDDEN, N_CLASSES, Init="PPR", dprate=0.0,
                     dropout=0.0, K=5, alpha=0.1)
    params = {
        "lin1": _lin(tm.lin1),
        "lin2": _lin(tm.lin2),
        "gamma": jnp.array(tm.prop1.temp.detach().numpy().astype(np.float32)),
    }
    model = B.GPRGNN(HIDDEN, N_CLASSES, dropout=0.0, dprate=0.0, K=5,
                     alpha=0.1)
    got = _apply(model, _vars(params), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


def test_multilp_parity(gnns, gx):
    g, x = gx
    n = x.shape[0]
    rng = np.random.default_rng(3)
    label = rng.integers(0, N_CLASSES, (n, 1)).astype(np.int64)
    train_idx = np.sort(rng.choice(n, 25, replace=False))
    tm = gnns.MultiLP(N_CLASSES, alpha=0.6, hops=2, num_iters=10)
    tm.eval()
    with torch.no_grad():
        want = tm(
            _t(x), _t(np.asarray(g.edge_index)), _t(label), _t(train_idx)
        ).numpy()
    ours = B.MultiLP(N_CLASSES, alpha=0.6, hops=2, num_iters=10)
    got = np.asarray(ours.predict(g, label, train_idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_multilp_mult_bin_parity(gnns, gx):
    g, x = gx
    n = x.shape[0]
    rng = np.random.default_rng(4)
    tasks = 3
    label = rng.integers(0, 2, (n, tasks)).astype(np.int64)
    train_idx = np.sort(rng.choice(n, 25, replace=False))
    tm = gnns.MultiLP(tasks, alpha=0.5, hops=1, num_iters=8, mult_bin=True)
    tm.eval()
    with torch.no_grad():
        want = tm(
            _t(x), _t(np.asarray(g.edge_index)), _t(label), _t(train_idx)
        ).numpy()
    ours = B.MultiLP(tasks, alpha=0.5, hops=1, num_iters=8, mult_bin=True)
    got = np.asarray(ours.predict(g, label, train_idx))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _map_gatconv(conv):
    """Shim GATConv (PyG 1.7.2 semantics) → our flax GATConv params:
    shared lin_l=lin_r → 'lin', att_l/att_r → att_src/att_dst (PyG's
    message is alpha_l[src] + alpha_r[dst])."""
    return {
        "lin": {"kernel": jnp.array(conv.lin_l.weight.detach().numpy().T)},
        "att_src": jnp.array(conv.att_l.detach().numpy()),
        "att_dst": jnp.array(conv.att_r.detach().numpy()),
        "bias": jnp.array(conv.bias.detach().numpy()),
    }


def test_gat_parity(gnns, gx):
    """GAT vs the reference's own ``large/gnns.py:272-310`` executing under
    the round-4 faithful GATConv shim (LeakyReLU additive logits,
    per-destination segment softmax, concat heads, mean on the out layer
    with ``out_heads=1``)."""
    g, x = gx
    tm = gnns.GAT(x.shape[1], 8, N_CLASSES, num_layers=3, dropout=0.0,
                  use_bn=True, heads=2, out_heads=1)
    params, stats = {}, {}
    for i, conv in enumerate(tm.convs):
        params[f"conv_{i}"] = _map_gatconv(conv)
    for i, bn in enumerate(tm.bns):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    model = B.GAT(8, N_CLASSES, num_layers=3, dropout=0.0, use_bn=True,
                  heads=2, out_heads=1)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("jk_type", ["cat", "max"])
def test_gatjk_parity(gnns, gx, jk_type):
    """GATJK vs ``large/gnns.py:501-552`` (all layers concat=True including
    the last, JK over post-activation features, final projection)."""
    g, x = gx
    tm = gnns.GATJK(x.shape[1], 8, N_CLASSES, num_layers=3, dropout=0.0,
                    heads=2, jk_type=jk_type)
    params, stats = {}, {}
    for i, conv in enumerate(tm.convs):
        params[f"conv_{i}"] = _map_gatconv(conv)
    for i, bn in enumerate(tm.bns):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(bn)
    params["final"] = _lin(tm.final_project)
    model = B.GATJK(8, N_CLASSES, num_layers=3, dropout=0.0, use_bn=True,
                    heads=2, jk_type=jk_type)
    got = _apply(model, _vars(params, stats), x, g, train=False)
    np.testing.assert_allclose(got, _ref_out(tm, x, g), rtol=2e-4, atol=2e-5)
