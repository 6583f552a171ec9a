"""2-axis (dp x sp) batched SPMD: loss/grad equality against the
single-device subgraph step, and convergence."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sgformer_tpu.data.loaders import synthetic_dataset
from sgformer_tpu.graph import add_self_loops, remove_self_loops, to_undirected
from sgformer_tpu.nn import SGFormer, SGFormerConfig
from sgformer_tpu.parallel import make_mesh
from sgformer_tpu.parallel.dp_batch import build_dp_sp_batch, make_dp_sp_train_step
from sgformer_tpu.train.batch_trainer import build_subgraph_batch
from sgformer_tpu.train.optim import dual_weight_decay_adam


def _problem():
    ds = synthetic_dataset(num_nodes=240, num_edges=2000, num_features=12,
                           num_classes=4, seed=5)
    n = ds.num_nodes
    e = to_undirected(ds.graph["edge_index"])
    e = add_self_loops(remove_self_loops(e), n)
    return ds, e, n


def test_dp_sp_step_matches_single_device_subgraph():
    ds, e, n = _problem()
    mesh = make_mesh((2, 4), ("dp", "sp"))
    cfg = SGFormerConfig(16, 4, gnn="graphconv", axis_name="sp",
                         trans_dropout=0.0, gnn_dropout=0.0)
    model = SGFormer(cfg)
    x_all = ds.graph["node_feat"]
    label_all = np.asarray(ds.label).reshape(-1).astype(np.int32)

    batches = [np.arange(0, 80), np.arange(80, 160)]
    graph, idx, nmask = build_dp_sp_batch(e, batches, n, sp=4, edge_cap=512)
    x = jnp.asarray(x_all[idx])  # [dp, N_pad, F]
    label = jnp.asarray(label_all[idx])
    tmask = jnp.asarray(nmask)  # every real node trains

    # init with an unsharded twin on batch 0's subgraph
    cfg0 = SGFormerConfig(16, 4, gnn="graphconv", trans_dropout=0.0,
                          gnn_dropout=0.0)
    model0 = SGFormer(cfg0)
    g0 = build_subgraph_batch(e, batches[0], n, bucket=512)
    variables = model0.init(
        jax.random.PRNGKey(0), jnp.asarray(x_all[batches[0]]), g0, train=False
    )
    params0 = variables["params"]
    bs0 = variables.get("batch_stats", {})
    tx = dual_weight_decay_adam(params0, 0.01, 1e-3, 1e-3)
    opt0 = tx.init(params0)

    # single-device reference: mean loss over BOTH subgraph batches
    def loss_fn(p):
        total = cnt = 0.0
        for bidx in batches:
            gb = build_subgraph_batch(e, bidx, n, bucket=512)
            out, _ = model0.apply(
                {"params": p, "batch_stats": bs0},
                jnp.asarray(x_all[bidx]), gb, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out)
            lab = jnp.asarray(label_all[bidx])
            per = -jnp.take_along_axis(logp, lab[:, None], axis=1)[:, 0]
            total = total + per.sum()
            cnt = cnt + per.shape[0]
        return total / cnt

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params0)

    # grads from the sharded step: recompute via a grad-only shard_map
    def grad_core(p, bs, x, g, label, tmask, nmask):
        g = g.local()
        x = x.reshape(x.shape[-2:])
        label = label.reshape(-1)
        tmask = tmask.reshape(-1)
        nmask = nmask.reshape(-1)

        def lf(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": bs}, x, g, train=True,
                node_mask=nmask, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out)
            per = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
            m = tmask.astype(jnp.float32)
            s, c = jax.lax.psum((jnp.sum(per * m), jnp.sum(m)), ("dp", "sp"))
            return s / c

        return jax.lax.pmean(jax.grad(lf)(p), ("dp", "sp"))

    grad_fn = jax.jit(jax.shard_map(
        grad_core, mesh=mesh,
        in_specs=(P(), P(), P("dp", "sp", None), P("dp", "sp"), P("dp", "sp"),
                  P("dp", "sp"), P("dp", "sp")),
        out_specs=P(), check_vma=False,
    ))
    grads_sp = grad_fn(params0, bs0, x, graph, label, tmask, jnp.asarray(nmask))
    for a, b in zip(jax.tree_util.tree_leaves(grads_ref),
                    jax.tree_util.tree_leaves(grads_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)

    # Donating step runs last: params0/bs0/opt0 are consumed by it.
    step = make_dp_sp_train_step(model, tx, mesh)
    params1, bs1, opt1, loss_sp = step(
        params0, bs0, opt0, jax.random.PRNGKey(1), x, graph, label, tmask,
        jnp.asarray(nmask),
    )
    assert np.allclose(float(loss_sp), float(loss_ref), rtol=1e-5)


def test_dp_sp_training_converges():
    ds, e, n = _problem()
    mesh = make_mesh((2, 4), ("dp", "sp"))
    cfg = SGFormerConfig(32, 4, gnn="graphconv", axis_name="sp",
                         trans_dropout=0.1, gnn_dropout=0.1)
    model = SGFormer(cfg)
    x_all = ds.graph["node_feat"]
    label_all = np.asarray(ds.label).reshape(-1).astype(np.int32)

    rng = np.random.default_rng(0)
    warm = [np.arange(0, 80), np.arange(80, 160)]
    graph, idx, nmask = build_dp_sp_batch(e, warm, n, sp=4, edge_cap=512)

    from sgformer_tpu.parallel.sharded import make_sharded_steps  # for init
    variables = jax.jit(jax.shard_map(
        lambda r, x, g, nm: model.init(
            {"params": r}, x.reshape(x.shape[-2:]), g.local(), train=False,
            node_mask=nm.reshape(-1)),
        mesh=mesh,
        in_specs=(P(), P("dp", "sp", None), P("dp", "sp"), P("dp", "sp")),
        out_specs=P(), check_vma=False,
    ))(jax.random.PRNGKey(0), jnp.asarray(x_all[idx]), graph, jnp.asarray(nmask))
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = dual_weight_decay_adam(params, 0.02, 1e-3, 1e-3)
    opt = tx.init(params)
    step = make_dp_sp_train_step(model, tx, mesh)

    key = jax.random.PRNGKey(3)
    losses = []
    for it in range(20):
        perm = rng.permutation(n)
        batches = [perm[:80], perm[80:160]]
        graph, idx, nmask = build_dp_sp_batch(e, batches, n, sp=4, edge_cap=512)
        key, drop = jax.random.split(key)
        params, bs, opt, loss = step(
            params, bs, opt, drop, jnp.asarray(x_all[idx]), graph,
            jnp.asarray(label_all[idx]), jnp.asarray(nmask), jnp.asarray(nmask),
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_dp_batch_trainer_tail_and_empty_group():
    """Epoch-remainder coverage on the dp mesh (round-5): n=241 with
    B=120, dp=2 gives one full step plus a remainder step whose groups
    carry 1 and 0 real nodes.  The empty group exercises the
    masked-attention/BN zero-count guards — without them its inf/nan
    would poison every peer through the gradient pmean — and the split
    smaller than B exercises the padded eval tail (previously 0.0)."""
    from sgformer_tpu.parallel.dp_trainer import DPBatchTrainer
    from sgformer_tpu.train import BatchTrainConfig

    ds = synthetic_dataset(num_nodes=241, num_edges=2000, num_features=12,
                           num_classes=4, seed=3)
    n = ds.num_nodes
    e = add_self_loops(remove_self_loops(to_undirected(ds.graph["edge_index"])), n)
    cfg = BatchTrainConfig(
        lr=0.02, epochs=6, eval_step=5, batch_size=120, ladder_base=512,
        display_step=-1,
    )
    model = SGFormer(SGFormerConfig(16, 4, gnn="graphconv", axis_name="sp",
                                    trans_dropout=0.0, gnn_dropout=0.0))
    trainer = DPBatchTrainer(
        model, e, ds.graph["node_feat"], np.asarray(ds.label), cfg,
        mesh=make_mesh((2, 4), ("dp", "sp")),
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    for leaf in jax.tree_util.tree_leaves(trainer.final_state):
        assert np.isfinite(np.asarray(leaf)).all(), "nan/inf in state"
    # every split is scored (valid split of 60 < B=120 used to be 0.0)
    s = logger.run_summary(0)
    assert s["final_test"] > 0.3
    assert logger.results[0][-1][1] > 0.0  # valid acc nonzero


def test_dp_batch_trainer_end_to_end():
    from sgformer_tpu.parallel.dp_trainer import DPBatchTrainer
    from sgformer_tpu.train import BatchTrainConfig

    ds, e, n = _problem()
    cfg = BatchTrainConfig(
        lr=0.02, epochs=10, eval_step=5, batch_size=60, ladder_base=512,
        display_step=-1,
    )
    model = SGFormer(SGFormerConfig(32, 4, gnn="graphconv", axis_name="sp",
                                    trans_dropout=0.1, gnn_dropout=0.1))
    trainer = DPBatchTrainer(
        model, e, ds.graph["node_feat"], np.asarray(ds.label), cfg,
        mesh=make_mesh((2, 4), ("dp", "sp")),
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.results[0]
    assert logger.run_summary(0)["final_test"] > 0.3


def test_dp_batch_trainer_dataset_smaller_than_global_batch():
    """num_nodes < batch_size*dp: the warm-init batch and the single
    remainder step must both run via short padded groups instead of
    indexing past the node array (round-5 review finding)."""
    from sgformer_tpu.parallel.dp_trainer import DPBatchTrainer
    from sgformer_tpu.train import BatchTrainConfig

    ds = synthetic_dataset(num_nodes=230, num_edges=1800, num_features=12,
                           num_classes=4, seed=7)
    n = ds.num_nodes
    e = add_self_loops(remove_self_loops(to_undirected(ds.graph["edge_index"])), n)
    cfg = BatchTrainConfig(
        lr=0.02, epochs=4, eval_step=3, batch_size=120, ladder_base=512,
        display_step=-1,
    )
    model = SGFormer(SGFormerConfig(16, 4, gnn="graphconv", axis_name="sp",
                                    trans_dropout=0.0, gnn_dropout=0.0))
    trainer = DPBatchTrainer(
        model, e, ds.graph["node_feat"], np.asarray(ds.label), cfg,
        mesh=make_mesh((2, 4), ("dp", "sp")),
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])  # must not raise
    for leaf in jax.tree_util.tree_leaves(trainer.final_state):
        assert np.isfinite(np.asarray(leaf)).all()
    assert 0.0 <= logger.run_summary(0)["final_test"] <= 1.0
