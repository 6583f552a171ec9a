"""Cross-implementation parity for the neighbor-sampled trainer: our
``SampledTrainer`` step vs the reference's own ``100M/nb-sample.py``
``train()``/``evaluate()`` functions executing on the SAME sampled batch
(seed-node loss masking — seeds are the first ``batch_size`` rows,
``nb-sample.py:27-45``).
"""

from __future__ import annotations

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_shim import REFERENCE_ROOT, load_reference  # noqa: E402

if not REFERENCE_ROOT.exists():  # pragma: no cover
    pytest.skip("no reference checkout", allow_module_level=True)

from test_reference_parity import copy_sgformer_variables  # noqa: E402

from sgformer_tpu.sample.neighbor import NeighborSampler  # noqa: E402
from sgformer_tpu.train.optim import dual_weight_decay_adam  # noqa: E402
from sgformer_tpu.train.sampled_trainer import batch_graph  # noqa: E402


def test_sampled_step_vs_reference_train_fn():
    ref_nb = load_reference(
        "100M/nb-sample.py", "ref_nb_sample",
        stub_modules=(
            "data_utils", "dataset", "parse", "torch_geometric.loader",
            "torch_geometric.seed", "torch_geometric.data",
        ),
    )
    ref_100m = load_reference("100M/ours.py", "ref_100m_ours_sampled")

    rng = np.random.default_rng(23)
    n, f, classes, bs = 200, 12, 4, 32
    edge_index = np.stack(
        [rng.integers(0, n, 900), rng.integers(0, n, 900)]
    ).astype(np.int64)
    # the 100M pipeline symmetrizes + self-loops BEFORE sampling
    # (nb-sample.py:79-80); our sampler consumes the preprocessed edges
    from sgformer_tpu.graph import add_self_loops, remove_self_loops, to_undirected

    edges = add_self_loops(remove_self_loops(to_undirected(edge_index)), n)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, classes, n).astype(np.int64)

    sampler = NeighborSampler(edges, n, fanouts=[5, 3], batch_size=bs,
                              seed=0, use_native=False)
    seeds = np.sort(rng.choice(n, bs, replace=False))
    batch = sampler.sample(seeds)
    assert batch.num_seeds == bs

    # --- the identical subgraph on the torch side (unpadded) ---
    n_real = int(batch.node_mask.sum())
    real_edges = batch.edge_weight > 0
    ei_local = np.stack(
        [batch.edge_src[real_edges], batch.edge_dst[real_edges]]
    ).astype(np.int64)
    gx = x[batch.node_ids[:n_real]]
    gy = y[batch.node_ids[:n_real]]
    graph_ns = types.SimpleNamespace(
        x=torch.tensor(gx), edge_index=torch.tensor(ei_local),
        y=torch.tensor(gy),
    )

    kw = dict(trans_num_layers=1, trans_num_heads=1, trans_dropout=0.0,
              gnn_num_layers=2, gnn_dropout=0.0, alpha=0.5)
    tmodel = ref_100m.SGFormer(f, 16, classes, **kw)
    lr, wd = 0.01, 1e-3
    optimizer = torch.optim.Adam(
        [
            {"params": tmodel.params1, "weight_decay": wd},
            {"params": tmodel.params2, "weight_decay": wd},
        ],
        lr=lr,
    )
    variables = copy_sgformer_variables(tmodel, 1, 2)

    # one reference train step + eval sweep (nb-sample.py:27-45)
    t_loss = ref_nb.train(tmodel, graph_ns, torch.nn.CrossEntropyLoss(),
                          optimizer, bs)
    t_correct, t_total = ref_nb.evaluate(tmodel, graph_ns, bs)

    # --- ours: the SampledTrainer step math on the padded batch ---
    from sgformer_tpu.nn import SGFormer, SGFormerConfig

    cfg = SGFormerConfig.papers100m(16, classes, **kw)
    model = SGFormer(cfg)
    params, stats = variables["params"], variables["batch_stats"]
    tx = dual_weight_decay_adam(params, lr, wd, wd)
    opt_state = tx.init(params)
    g_b = batch_graph(batch)
    x_b = jnp.asarray(x[batch.node_ids])
    label_b = jnp.asarray(y[batch.node_ids].astype(np.int32))
    mask_b = jnp.asarray(batch.node_mask)

    import optax

    def loss_fn(p, bs_):
        out, mut = model.apply(
            {"params": p, "batch_stats": bs_}, x_b, g_b, train=True,
            node_mask=mask_b, mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(out[:bs])
        per = -jnp.take_along_axis(logp, label_b[:bs, None], axis=1)[:, 0]
        return per.mean(), mut["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, stats
    )
    np.testing.assert_allclose(float(loss), t_loss, rtol=2e-4)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    # post-step eval: same seed-node prediction counts
    out = model.apply(
        {"params": params, "batch_stats": new_stats}, x_b, g_b, train=False,
        node_mask=mask_b,
    )
    pred = np.asarray(jnp.argmax(out[:bs], axis=-1))
    correct = int((pred == gy[:bs]).sum())
    assert (correct, bs) == (int(t_correct), int(t_total))


def test_sampled_tail_batch_vs_reference():
    """The epoch's REMAINDER batch (num_seeds < batch_size): the reference
    trains/evaluates it over its true per-batch seed count
    (``graph.batch_size``, ``nb-sample.py:174,181`` — NeighborLoader has no
    drop_last), so our sampler must yield it and the trainer's
    seed-count-masked loss must reproduce the reference's step exactly.
    Drives the REAL ``SampledTrainer._steps`` closures, not a hand-rolled
    mirror (round-5: the round-4 sampler dropped the tail entirely)."""
    ref_nb = load_reference(
        "100M/nb-sample.py", "ref_nb_sample_tail",
        stub_modules=(
            "data_utils", "dataset", "parse", "torch_geometric.loader",
            "torch_geometric.seed", "torch_geometric.data",
        ),
    )
    ref_100m = load_reference("100M/ours.py", "ref_100m_ours_tail")

    rng = np.random.default_rng(31)
    n, f, classes, bs = 200, 12, 4, 32
    edge_index = np.stack(
        [rng.integers(0, n, 900), rng.integers(0, n, 900)]
    ).astype(np.int64)
    from sgformer_tpu.graph import add_self_loops, remove_self_loops, to_undirected

    edges = add_self_loops(remove_self_loops(to_undirected(edge_index)), n)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, classes, n).astype(np.int64)

    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.sampled_trainer import (SampledTrainConfig,
                                                    SampledTrainer)

    kw = dict(trans_num_layers=1, trans_num_heads=1, trans_dropout=0.0,
              gnn_num_layers=2, gnn_dropout=0.0, alpha=0.5)
    cfg = SGFormerConfig.papers100m(16, classes, **kw)
    model = SGFormer(cfg)
    tc = SampledTrainConfig(batch_size=bs, fanouts=(5, 3), seed=0,
                            lr=0.01, trans_weight_decay=1e-3,
                            gnn_weight_decay=1e-3)
    trainer = SampledTrainer(model, edges, x, y, tc)
    trainer.sampler.use_native = False

    # pool of 48 seeds -> one full batch (32) + one TAIL batch (16)
    pool = np.sort(rng.choice(n, 48, replace=False))
    batches = list(trainer.sampler.epoch(pool, shuffle=False))
    assert [b.num_seeds for b in batches] == [32, 16]
    tail = batches[1]

    # identical unpadded subgraph on the torch side
    import types as _types

    n_real = int(tail.node_mask.sum())
    real_edges = tail.edge_weight > 0
    ei_local = np.stack(
        [tail.edge_src[real_edges], tail.edge_dst[real_edges]]
    ).astype(np.int64)
    graph_ns = _types.SimpleNamespace(
        x=torch.tensor(x[tail.node_ids[:n_real]]),
        edge_index=torch.tensor(ei_local),
        y=torch.tensor(y[tail.node_ids[:n_real]]),
    )

    tmodel = ref_100m.SGFormer(f, 16, classes, **kw)
    variables = copy_sgformer_variables(tmodel, 1, 2)
    optimizer = torch.optim.Adam(
        [
            {"params": tmodel.params1, "weight_decay": 1e-3},
            {"params": tmodel.params2, "weight_decay": 1e-3},
        ],
        lr=0.01,
    )
    # reference step over graph.batch_size = 16 (the tail's true count)
    t_loss = ref_nb.train(tmodel, graph_ns, torch.nn.CrossEntropyLoss(),
                          optimizer, tail.num_seeds)
    t_correct, t_total = ref_nb.evaluate(tmodel, graph_ns, tail.num_seeds)

    # ours: the trainer's own jitted closures on the padded tail batch
    tx = dual_weight_decay_adam(variables["params"], 0.01, 1e-3, 1e-3)
    opt_state = tx.init(variables["params"])
    train_step, eval_step = trainer._steps(tx)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    g_b = batch_graph(tail)
    state, opt_state, loss = train_step(
        state, opt_state, jax.random.PRNGKey(0),
        jnp.asarray(x[tail.node_ids]), g_b,
        jnp.asarray(y[tail.node_ids].astype(np.int32)),
        jnp.asarray(tail.node_mask),
        jnp.asarray(float(tail.num_seeds), jnp.float32),
    )
    np.testing.assert_allclose(float(loss), t_loss, rtol=2e-4)

    pred = np.asarray(eval_step(
        state, jnp.asarray(x[tail.node_ids]), g_b,
        jnp.asarray(tail.node_mask),
    ))[: tail.num_seeds]
    correct = int((pred == y[tail.node_ids[: tail.num_seeds]]).sum())
    assert (correct, tail.num_seeds) == (int(t_correct), int(t_total))
