"""Cross-implementation parity: this framework vs the reference's OWN code.

These tests execute the reference's unmodified torch model files
(``large/ours.py``, ``100M/ours.py``) via ``reference_shim`` and assert
that our JAX models — with the torch weights copied in — produce the same
forwards, the same BatchNorm statistics, the same attention maps, and the
same full TRAINING TRAJECTORY (torch ``Adam`` with per-branch L2 vs our
``dual_weight_decay_adam``).

No real dataset exists in this environment (VERDICT round-1 task 4), so
accuracy reproduction cannot be run file-for-file; this suite is the
strongest available substitute: behavioral equivalence with the code that
PRODUCED the published numbers (``large/run.sh:1-21``), on synthetic
graphs, in both eval and train modes.
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
from sgformer_tpu.nn import SGFormer, SGFormerConfig  # noqa: E402
from sgformer_tpu.train.optim import dual_weight_decay_adam  # noqa: E402
from sgformer_tpu.train.trainer import cross_entropy_loss  # noqa: E402


@pytest.fixture(scope="module")
def ref_large():
    return load_reference("large/ours.py", "ref_large_ours")


@pytest.fixture(scope="module")
def ref_100m():
    return load_reference("100M/ours.py", "ref_100m_ours")


@pytest.fixture(scope="module")
def graph_and_x():
    rng = np.random.default_rng(11)
    n, f = 60, 24
    src = rng.integers(0, n, 260)
    dst = rng.integers(0, n, 260)
    edge_index = np.stack([src, dst]).astype(np.int64)
    g = preprocess_graph(edge_index, n)  # undirected + self-loops
    x = rng.standard_normal((n, f)).astype(np.float32)
    return g, x


def _t(a):
    return torch.tensor(np.asarray(a))


def _lin(mod):
    """torch nn.Linear → flax TorchLinear params."""
    return {
        "kernel": jnp.array(mod.weight.detach().numpy().T),
        "bias": jnp.array(mod.bias.detach().numpy()),
    }


def _ln(mod):
    return {
        "scale": jnp.array(mod.weight.detach().numpy()),
        "bias": jnp.array(mod.bias.detach().numpy()),
    }


def copy_sgformer_variables(tmodel, trans_layers, gnn_layers, use_graph=True):
    """Map the reference SGFormer's torch state into our flax variable tree
    (params + batch_stats).  Layout: ``large/ours.py:241-263`` →
    ``nn/sgformer.py`` names."""
    tc = tmodel.trans_conv
    trans = {"fc_in": _lin(tc.fcs[0]), "ln_in": _ln(tc.bns[0])}
    for i in range(trans_layers):
        conv = tc.convs[i]
        entry = {"Wq": _lin(conv.Wq), "Wk": _lin(conv.Wk)}
        if getattr(conv, "use_weight", True):
            entry["Wv"] = _lin(conv.Wv)
        trans[f"conv_{i}"] = entry
        trans[f"ln_{i}"] = _ln(tc.bns[i + 1])
    params = {"trans_conv": trans, "fc": _lin(tmodel.fc)}
    batch_stats = {}
    if use_graph:
        gc = tmodel.graph_conv
        graph = {"fc_in": _lin(gc.fcs[0]), "bn_in": _ln(gc.bns[0])}
        stats = {
            "bn_in": {
                "mean": jnp.array(gc.bns[0].running_mean.detach().numpy()),
                "var": jnp.array(gc.bns[0].running_var.detach().numpy()),
            }
        }
        for i in range(gnn_layers):
            conv = gc.convs[i]
            entry = {}
            if getattr(conv, "use_weight", True) or getattr(conv, "use_init", False):
                entry["W"] = _lin(conv.W)
            graph[f"conv_{i}"] = entry
            graph[f"bn_{i}"] = _ln(gc.bns[i + 1])
            stats[f"bn_{i}"] = {
                "mean": jnp.array(gc.bns[i + 1].running_mean.detach().numpy()),
                "var": jnp.array(gc.bns[i + 1].running_var.detach().numpy()),
            }
        # flax drops param-less submodules (use_weight=False convs) from
        # the tree entirely, so omit their empty entries.
        params["graph_conv"] = {k: v for k, v in graph.items() if v != {}}
        batch_stats["graph_conv"] = stats
    return {"params": params, "batch_stats": batch_stats}


def torch_stats(tmodel, gnn_layers):
    gc = tmodel.graph_conv
    out = {
        "bn_in": (
            gc.bns[0].running_mean.detach().numpy(),
            gc.bns[0].running_var.detach().numpy(),
        )
    }
    for i in range(gnn_layers):
        out[f"bn_{i}"] = (
            gc.bns[i + 1].running_mean.detach().numpy(),
            gc.bns[i + 1].running_var.detach().numpy(),
        )
    return out


# ---------------------------------------------------------------------------
# 1. The attention kernel vs the reference's full_attention_conv
# ---------------------------------------------------------------------------


def test_full_attention_conv_vs_reference_code(ref_100m):
    from sgformer_tpu.ops.attention import linear_attention

    rng = np.random.default_rng(0)
    n, h, m = 37, 3, 8
    qs = rng.standard_normal((n, h, m)).astype(np.float32)
    ks = rng.standard_normal((n, h, m)).astype(np.float32)
    vs = rng.standard_normal((n, h, m)).astype(np.float32)

    want = ref_100m.full_attention_conv(_t(qs), _t(ks), _t(vs)).numpy()
    got = np.asarray(linear_attention(jnp.asarray(qs), jnp.asarray(ks), jnp.asarray(vs)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    want_out, want_attn = ref_100m.full_attention_conv(
        _t(qs), _t(ks), _t(vs), output_attn=True
    )
    got_out, got_attn = linear_attention(
        jnp.asarray(qs), jnp.asarray(ks), jnp.asarray(vs), output_attn=True
    )
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. Full-model forward parity, both residual modes, eval AND train mode
# ---------------------------------------------------------------------------


def _make_pair(ref_mod, cfg, tkwargs, graph_and_x, classes=5, hidden=16):
    g, x = graph_and_x
    tmodel = ref_mod.SGFormer(x.shape[1], hidden, classes, **tkwargs)
    model = SGFormer(cfg)
    variables = copy_sgformer_variables(
        tmodel,
        cfg.trans_num_layers,
        cfg.gnn_num_layers,
        use_graph=cfg.gnn != "none",
    )
    return tmodel, model, variables, g, x


LARGE_KW = dict(
    trans_num_layers=2,
    trans_num_heads=2,
    trans_dropout=0.0,
    gnn_num_layers=2,
    gnn_dropout=0.0,
)


def large_cfg(classes=5, hidden=16, **kw):
    return SGFormerConfig.large(
        hidden,
        classes,
        trans_num_layers=2,
        trans_num_heads=2,
        trans_dropout=0.0,
        gnn_num_layers=2,
        gnn_dropout=0.0,
        **kw,
    )


def test_sgformer_large_eval_parity(ref_large, graph_and_x):
    tmodel, model, variables, g, x = _make_pair(
        ref_large, large_cfg(), LARGE_KW, graph_and_x
    )
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(_t(x), _t(np.asarray(g.edge_index))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sgformer_large_train_mode_parity(ref_large, graph_and_x):
    """Train-mode forward: BatchNorm batch statistics + running-stat update
    must match torch ``BatchNorm1d`` exactly (momentum 0.1, unbiased running
    var — ``large/ours.py:54-58``)."""
    tmodel, model, variables, g, x = _make_pair(
        ref_large, large_cfg(), LARGE_KW, graph_and_x
    )
    tmodel.train()
    want = tmodel(_t(x), _t(np.asarray(g.edge_index))).detach().numpy()
    got, mutated = model.apply(
        variables, jnp.asarray(x), g, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    ours = jax.tree_util.tree_map(np.asarray, mutated["batch_stats"])["graph_conv"]
    for name, (t_mean, t_var) in torch_stats(tmodel, 2).items():
        np.testing.assert_allclose(ours[name]["mean"], t_mean, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ours[name]["var"], t_var, rtol=1e-4, atol=1e-6)


def test_sgformer_100m_alpha_parity(ref_100m, graph_and_x):
    cfg = SGFormerConfig.papers100m(
        16,
        5,
        trans_num_layers=2,
        trans_num_heads=1,
        trans_dropout=0.0,
        gnn_num_layers=1,
        gnn_dropout=0.0,
        alpha=0.3,
    )
    tkwargs = dict(
        trans_num_layers=2,
        trans_num_heads=1,
        trans_dropout=0.0,
        gnn_num_layers=1,
        gnn_dropout=0.0,
        alpha=0.3,
    )
    tmodel, model, variables, g, x = _make_pair(ref_100m, cfg, tkwargs, graph_and_x)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(_t(x), _t(np.asarray(g.edge_index))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sgformer_use_init_and_cat_parity(ref_large, graph_and_x):
    cfg = large_cfg(gnn_use_init=True, aggregate="cat")
    tkwargs = dict(LARGE_KW, gnn_use_init=True, aggregate="cat")
    tmodel, model, variables, g, x = _make_pair(ref_large, cfg, tkwargs, graph_and_x)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(_t(x), _t(np.asarray(g.edge_index))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), g, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_get_attentions_parity(ref_large, graph_and_x):
    tmodel, model, variables, g, x = _make_pair(
        ref_large, large_cfg(), LARGE_KW, graph_and_x
    )
    tmodel.eval()
    with torch.no_grad():
        want = tmodel.get_attentions(_t(x)).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(x), method=SGFormer.get_attentions)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 3. Training-trajectory parity: torch Adam + per-branch L2 vs our optimizer
# ---------------------------------------------------------------------------


def test_training_trajectory_vs_reference(ref_large, graph_and_x):
    """Replicates the reference run loop (``large/main.py:114-143``:
    two-group torch Adam, log_softmax + NLL on the train indices) and
    asserts our jitted train step follows the SAME loss/logits trajectory
    from the same initial weights."""
    g, x = graph_and_x
    n = x.shape[0]
    classes = 5
    rng = np.random.default_rng(3)
    y = rng.integers(0, classes, n).astype(np.int64)
    train_idx = np.sort(rng.choice(n, size=40, replace=False)).astype(np.int32)

    lr, trans_wd, gnn_wd = 0.01, 1e-3, 5e-4
    epochs = 30

    tmodel = ref_large.SGFormer(x.shape[1], 16, classes, **LARGE_KW)
    cfg = large_cfg()
    model = SGFormer(cfg)
    variables = copy_sgformer_variables(tmodel, 2, 2)

    # --- torch side (the reference's own loop) ---
    optimizer = torch.optim.Adam(
        [
            {"params": tmodel.params1, "weight_decay": trans_wd},
            {"params": tmodel.params2, "weight_decay": gnn_wd},
        ],
        lr=lr,
    )
    criterion = torch.nn.NLLLoss()
    tx, tedges = _t(x), _t(np.asarray(g.edge_index))
    ty, tidx = torch.tensor(y), torch.tensor(train_idx.astype(np.int64))
    t_losses, t_logits = [], []
    for _ in range(epochs):
        tmodel.train()
        optimizer.zero_grad()
        out = tmodel(tx, tedges)
        loss = criterion(torch.nn.functional.log_softmax(out, dim=1)[tidx], ty[tidx])
        loss.backward()
        optimizer.step()
        t_losses.append(float(loss.detach()))
        t_logits.append(out.detach().numpy())

    # --- our side: jitted step, dual-weight-decay Adam ---
    params, stats = variables["params"], variables["batch_stats"]
    tx_j, ty_j, tidx_j = jnp.asarray(x), jnp.asarray(y), jnp.asarray(train_idx)
    opt = dual_weight_decay_adam(params, lr, trans_wd, gnn_wd)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats},
                tx_j,
                g,
                train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, ty_j, tidx_j), (logits, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, mut["batch_stats"], opt_state, loss, logits

    j_losses, j_logits = [], []
    for _ in range(epochs):
        params, stats, opt_state, loss, logits = step(params, stats, opt_state)
        j_losses.append(float(loss))
        j_logits.append(np.asarray(logits))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)
    # early-trajectory logits are tight; late ones accumulate f32 drift
    np.testing.assert_allclose(j_logits[0], t_logits[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        j_logits[-1], t_logits[-1], rtol=5e-2, atol=5e-3
    )
    # prediction agreement at the end of training
    agree = (j_logits[-1].argmax(1) == t_logits[-1].argmax(1)).mean()
    assert agree >= 0.98, f"prediction agreement {agree}"
