"""Sharded-vs-single-device equality: forward logits, loss, gradients, and a
full train step must match bit-for-bit semantics (allclose) between the
unsharded path and the 8-way node-sharded shard_map path on the virtual CPU
mesh (SURVEY.md §4(d))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.nn import SGFormer, SGFormerConfig
from sgformer_tpu.parallel import make_mesh, partition_graph
from sgformer_tpu.parallel.partition import idx_to_mask, node_mask_for, pad_to_shards
from sgformer_tpu.parallel.sharded import ShardedTrainer, make_sharded_steps
from sgformer_tpu.train.optim import dual_weight_decay_adam
from sgformer_tpu.train.trainer import TrainConfig, Trainer

import reference_numpy as ref


N_DEV = 8


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    n = 50  # deliberately NOT divisible by 8 — exercises padding
    edge_index = ref.random_graph(rng, n, 300)
    g = preprocess_graph(edge_index, n, with_pyg_norm=True)
    x = rng.standard_normal((n, 12)).astype(np.float32)
    label = rng.integers(0, 4, n).reshape(-1, 1)
    return g, x, label


def _single_device_logits(model, variables, x, g, node_mask=None):
    return np.asarray(
        model.apply(variables, jnp.asarray(x), g, train=False)
    )


@pytest.mark.parametrize("gnn", ["graphconv", "gcn"])
def test_sharded_forward_matches_single(problem, gnn):
    g, x, label = problem
    mesh = make_mesh((N_DEV,), ("sp",))

    cfg = SGFormerConfig(16, 4, gnn=gnn, trans_num_layers=2)
    cfg_sp = SGFormerConfig(16, 4, gnn=gnn, trans_num_layers=2, axis_name="sp")
    model = SGFormer(cfg)
    model_sp = SGFormer(cfg_sp)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), g, train=False)
    want = _single_device_logits(model, variables, x, g)

    sg = partition_graph(g, N_DEV, "sp")
    x_pad = jnp.asarray(pad_to_shards(x, sg.total_nodes))
    nmask = jnp.asarray(node_mask_for(g.num_nodes, sg.total_nodes))

    def eval_core(params, batch_stats, xp, gg, nm):
        gg = gg.local()
        return model_sp.apply(
            {"params": params, "batch_stats": batch_stats},
            xp, gg, train=False, node_mask=nm,
        )

    eval_step = jax.jit(
        jax.shard_map(
            eval_core,
            mesh=mesh,
            in_specs=(P(), P(), P("sp", None), P("sp"), P("sp")),
            out_specs=P("sp", None),
            check_vma=False,
        )
    )
    got = np.asarray(
        eval_step(variables["params"], variables.get("batch_stats", {}), x_pad, sg, nmask)
    )[: g.num_nodes]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_train_step_matches_single(problem):
    g, x, label = problem
    mesh = make_mesh((N_DEV,), ("sp",))
    cfg = SGFormerConfig(16, 4, gnn="graphconv", trans_dropout=0.0, gnn_dropout=0.0)
    cfg_sp = SGFormerConfig(
        16, 4, gnn="graphconv", trans_dropout=0.0, gnn_dropout=0.0, axis_name="sp"
    )
    model, model_sp = SGFormer(cfg), SGFormer(cfg_sp)

    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x), g, train=False)
    params0 = variables["params"]
    bs0 = variables.get("batch_stats", {})
    tx = dual_weight_decay_adam(params0, 0.01, 1e-3, 5e-4)
    opt0 = tx.init(params0)

    train_idx = np.arange(0, g.num_nodes, 2)
    lab = jnp.asarray(np.asarray(label).reshape(-1).astype(np.int32))

    # ---- single-device step (no dropout so RNG is irrelevant) ----
    def loss_fn(p, bs):
        out, mut = model.apply(
            {"params": p, "batch_stats": bs},
            jnp.asarray(x), g, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(out)
        per = -jnp.take_along_axis(logp, lab[:, None], axis=1)[:, 0]
        return per[jnp.asarray(train_idx)].mean(), mut["batch_stats"]

    (loss1, bs1), grads1 = jax.value_and_grad(loss_fn, has_aux=True)(params0, bs0)
    upd1, optA = tx.update(grads1, opt0, params0)
    params1 = jax.tree_util.tree_map(lambda a, b: a + b, params0, upd1)

    # ---- sharded step ----
    sg = partition_graph(g, N_DEV, "sp")
    x_pad = jnp.asarray(pad_to_shards(x, sg.total_nodes))
    nmask = jnp.asarray(node_mask_for(g.num_nodes, sg.total_nodes))
    tmask = jnp.asarray(idx_to_mask(train_idx, sg.total_nodes))
    lab_pad = jnp.asarray(
        pad_to_shards(np.asarray(label).reshape(-1).astype(np.int32), sg.total_nodes)
    )
    # Gradients must match (Adam at step 1 maps any near-zero grad element to
    # ±lr, so post-update params are NOT a stable comparison target — the
    # grads and the loss are).  Computed BEFORE the train step because the
    # step donates params0/bs0/opt0 (the production configuration).
    def grad_core(p, bs, rng, tm, xp, gg, lb, nm):
        gg = gg.local()

        def lf(p):
            out, _ = model_sp.apply(
                {"params": p, "batch_stats": bs}, xp, gg, train=True,
                node_mask=nm, rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out)
            per = -jnp.take_along_axis(logp, lb[:, None], axis=1)[:, 0]
            m = tm.astype(jnp.float32)
            s, c = jax.lax.psum((jnp.sum(per * m), jnp.sum(m)), "sp")
            return s / c

        return jax.lax.pmean(jax.grad(lf)(p), "sp")

    grad_fn = jax.jit(
        jax.shard_map(
            grad_core, mesh=mesh,
            in_specs=(P(), P(), P(), P("sp"), P("sp", None), P("sp"), P("sp"), P("sp")),
            out_specs=P(), check_vma=False,
        )
    )
    grads2 = grad_fn(
        params0, bs0, jax.random.PRNGKey(0), tmask, x_pad, sg, lab_pad, nmask
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(grads1), jax.tree_util.tree_leaves(grads2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    # Donating train step (params0/bs0/opt0 are consumed here — last use).
    train_step, _ = make_sharded_steps(model_sp, tx, mesh, "sp")
    params2, bs2, opt2, loss2 = train_step(
        params0, bs0, opt0, jax.random.PRNGKey(0), tmask, x_pad, sg, lab_pad, nmask
    )

    assert np.allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs1), jax.tree_util.tree_leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-5)


def test_sharded_trainer_learns(problem):
    """End-to-end: the sharded trainer fits a learnable synthetic task."""
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=200, num_edges=1600, num_features=16,
                           num_classes=4, seed=3)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    cfg = SGFormerConfig(32, 4, gnn="graphconv", axis_name="sp",
                         trans_dropout=0.1, gnn_dropout=0.1)
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=30, eval_step=5, runs=1, display_step=-1)
    trainer = ShardedTrainer(
        model, g, ds.graph["node_feat"], ds.label, tc,
        mesh=make_mesh((N_DEV,), ("sp",)),
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    stats = logger.run_summary(0)
    assert stats["final_test"] > 0.5  # well above 0.25 chance


@pytest.mark.parametrize("dtype", ["f32"])
def test_sharded_chunked_spmm_matches_plain(problem, dtype):
    """Sharded forward with per-shard Pallas chunk plans (interpret mode)
    == the XLA sharded path == the single-device path."""
    g, x, label = problem
    mesh = make_mesh((N_DEV,), ("sp",))
    cfg_sp = SGFormerConfig(16, 4, gnn="graphconv", trans_num_layers=1,
                            axis_name="sp")
    model_sp = SGFormer(cfg_sp)

    sg_plain = partition_graph(g, N_DEV, "sp")
    sg_chunk = partition_graph(
        g, N_DEV, "sp", with_chunks=True, chunk_edges=128, window_rows=64,
        chunk_dtype=dtype, chunk_interpret=True,
    )
    x_pad = jnp.asarray(pad_to_shards(x, sg_plain.total_nodes))
    nmask = jnp.asarray(node_mask_for(g.num_nodes, sg_plain.total_nodes))

    variables = SGFormer(SGFormerConfig(16, 4, gnn="graphconv",
                                        trans_num_layers=1)).init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False
    )

    def eval_core(params, bs, xp, gg, nm):
        gg = gg.local()
        return model_sp.apply(
            {"params": params, "batch_stats": bs}, xp, gg, train=False,
            node_mask=nm,
        )

    def run(sg):
        step = jax.jit(jax.shard_map(
            eval_core, mesh=mesh,
            in_specs=(P(), P(), P("sp", None), P("sp"), P("sp")),
            out_specs=P("sp", None), check_vma=False,
        ))
        return np.asarray(step(
            variables["params"], variables.get("batch_stats", {}),
            x_pad, sg, nmask,
        ))[: g.num_nodes]

    out_plain = run(sg_plain)
    out_chunk = run(sg_chunk)
    np.testing.assert_allclose(out_chunk, out_plain, rtol=2e-4, atol=2e-4)


def test_sharded_chunked_grads_match(problem):
    g, x, label = problem
    mesh = make_mesh((N_DEV,), ("sp",))
    cfg_sp = SGFormerConfig(16, 4, gnn="graphconv", trans_num_layers=1,
                            trans_dropout=0.0, gnn_dropout=0.0,
                            axis_name="sp")
    model_sp = SGFormer(cfg_sp)
    sg_plain = partition_graph(g, N_DEV, "sp")
    sg_chunk = partition_graph(
        g, N_DEV, "sp", with_chunks=True, chunk_edges=128, window_rows=64,
        chunk_dtype="f32", chunk_interpret=True,
    )
    x_pad = jnp.asarray(pad_to_shards(x, sg_plain.total_nodes))
    nmask = jnp.asarray(node_mask_for(g.num_nodes, sg_plain.total_nodes))
    lab = jnp.asarray(pad_to_shards(
        np.asarray(label).reshape(-1).astype(np.int32), sg_plain.total_nodes))
    tmask = nmask

    variables = SGFormer(SGFormerConfig(
        16, 4, gnn="graphconv", trans_num_layers=1,
        trans_dropout=0.0, gnn_dropout=0.0)).init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False
    )

    def grad_core(p, bs, xp, gg, lb, tm, nm):
        gg = gg.local()

        def lf(p):
            out, _ = model_sp.apply(
                {"params": p, "batch_stats": bs}, xp, gg, train=True,
                node_mask=nm, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out)
            per = -jnp.take_along_axis(logp, lb[:, None], axis=1)[:, 0]
            m = tm.astype(jnp.float32)
            s, c = jax.lax.psum((jnp.sum(per * m), jnp.sum(m)), "sp")
            return s / c

        return jax.lax.pmean(jax.grad(lf)(p), "sp")

    def grads(sg):
        fn = jax.jit(jax.shard_map(
            grad_core, mesh=mesh,
            in_specs=(P(), P(), P("sp", None), P("sp"), P("sp"), P("sp"),
                      P("sp")),
            out_specs=P(), check_vma=False,
        ))
        return fn(variables["params"], variables.get("batch_stats", {}),
                  x_pad, sg, lab, tmask, nmask)

    g_plain = grads(sg_plain)
    g_chunk = grads(sg_chunk)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_trainer_pallas_mode(problem):
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=160, num_edges=1200, num_features=12,
                           num_classes=4, seed=4)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    cfg = SGFormerConfig(16, 4, gnn="graphconv", axis_name="sp")
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=5, eval_step=5, display_step=-1)
    trainer = ShardedTrainer(
        model, g, ds.graph["node_feat"], ds.label, tc,
        mesh=make_mesh((N_DEV,), ("sp",)), use_pallas=True,
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.results[0]


def test_halo_propagate_matches_allgather(problem):
    """Halo all-to-all exchange == full all_gather path == single device,
    and its traffic is bounded by the boundary-row count, not N."""
    g, x, label = problem
    mesh = make_mesh((N_DEV,), ("sp",))
    cfg_sp = SGFormerConfig(16, 4, gnn="graphconv", trans_num_layers=1,
                            axis_name="sp")
    model_sp = SGFormer(cfg_sp)

    sg_plain = partition_graph(g, N_DEV, "sp")
    sg_halo = partition_graph(g, N_DEV, "sp", with_halo=True)
    assert sg_halo.halo_rows >= 1
    x_pad = jnp.asarray(pad_to_shards(x, sg_plain.total_nodes))
    nmask = jnp.asarray(node_mask_for(g.num_nodes, sg_plain.total_nodes))

    variables = SGFormer(SGFormerConfig(16, 4, gnn="graphconv",
                                        trans_num_layers=1)).init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False
    )

    def eval_core(params, bs, xp, gg, nm):
        gg = gg.local()
        return model_sp.apply(
            {"params": params, "batch_stats": bs}, xp, gg, train=False,
            node_mask=nm,
        )

    def run(sg):
        step = jax.jit(jax.shard_map(
            eval_core, mesh=mesh,
            in_specs=(P(), P(), P("sp", None), P("sp"), P("sp")),
            out_specs=P("sp", None), check_vma=False,
        ))
        return np.asarray(step(
            variables["params"], variables.get("batch_stats", {}),
            x_pad, sg, nmask,
        ))[: g.num_nodes]

    np.testing.assert_allclose(run(sg_halo), run(sg_plain),
                               rtol=2e-5, atol=2e-5)


def test_halo_grads_match_allgather(problem):
    g, x, label = problem
    mesh = make_mesh((N_DEV,), ("sp",))
    cfg_sp = SGFormerConfig(16, 4, gnn="graphconv", trans_num_layers=1,
                            trans_dropout=0.0, gnn_dropout=0.0,
                            axis_name="sp")
    model_sp = SGFormer(cfg_sp)
    sg_plain = partition_graph(g, N_DEV, "sp")
    sg_halo = partition_graph(g, N_DEV, "sp", with_halo=True)
    x_pad = jnp.asarray(pad_to_shards(x, sg_plain.total_nodes))
    nmask = jnp.asarray(node_mask_for(g.num_nodes, sg_plain.total_nodes))
    lab = jnp.asarray(pad_to_shards(
        np.asarray(label).reshape(-1).astype(np.int32), sg_plain.total_nodes))

    variables = SGFormer(SGFormerConfig(
        16, 4, gnn="graphconv", trans_num_layers=1,
        trans_dropout=0.0, gnn_dropout=0.0)).init(
        jax.random.PRNGKey(0), jnp.asarray(x), g, train=False
    )

    def grad_core(p, bs, xp, gg, lb, nm):
        gg = gg.local()

        def lf(p):
            out, _ = model_sp.apply(
                {"params": p, "batch_stats": bs}, xp, gg, train=True,
                node_mask=nm, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out)
            per = -jnp.take_along_axis(logp, lb[:, None], axis=1)[:, 0]
            m = nm.astype(jnp.float32)
            s, c = jax.lax.psum((jnp.sum(per * m), jnp.sum(m)), "sp")
            return s / c

        return jax.lax.pmean(jax.grad(lf)(p), "sp")

    def grads(sg):
        fn = jax.jit(jax.shard_map(
            grad_core, mesh=mesh,
            in_specs=(P(), P(), P("sp", None), P("sp"), P("sp"), P("sp")),
            out_specs=P(), check_vma=False,
        ))
        return fn(variables["params"], variables.get("batch_stats", {}),
                  x_pad, sg, lab, nmask)

    for a, b in zip(jax.tree_util.tree_leaves(grads(sg_plain)),
                    jax.tree_util.tree_leaves(grads(sg_halo))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_halo_volume_shrinks_with_clustering():
    """On a clustered graph, halo traffic << all_gather volume."""
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=800, num_edges=6000, num_features=4,
                           num_classes=8, seed=7, homophily=0.98)
    # cluster by community: each shard then owns exactly one community and
    # cross-shard edges are only the 2% random rewires
    order = np.argsort(np.asarray(ds.label).reshape(-1), kind="stable")
    perm = np.empty(ds.num_nodes, dtype=np.int64)
    perm[order] = np.arange(ds.num_nodes)
    src, dst = ds.graph["edge_index"]
    g = preprocess_graph(np.stack([perm[src], perm[dst]]), ds.num_nodes)
    sg = partition_graph(g, 8, "sp", with_halo=True)
    halo_volume = 8 * 8 * sg.halo_rows  # rows exchanged per step
    allgather_volume = 8 * sg.total_nodes
    assert halo_volume < allgather_volume, (halo_volume, allgather_volume)


def test_reorder_flag_shrinks_halo_volume():
    """preprocess_graph(reorder=True): the structural clustering reorder
    (no label access) aligns contiguous shards with communities, so halo
    traffic drops vs the unordered partition (VERDICT r1 task 6)."""
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=800, num_edges=6000, num_features=4,
                           num_classes=8, seed=7, homophily=0.95)
    g_plain = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    g_re = preprocess_graph(ds.graph["edge_index"], ds.num_nodes,
                            reorder=True)
    assert g_re.node_perm is not None
    sg_plain = partition_graph(g_plain, 8, "sp", with_halo=True)
    sg_re = partition_graph(g_re, 8, "sp", with_halo=True)
    assert sg_re.halo_rows < sg_plain.halo_rows, (
        sg_re.halo_rows, sg_plain.halo_rows
    )
    # and far below the all_gather volume
    assert 8 * 8 * sg_re.halo_rows < 8 * sg_re.total_nodes


def test_sharded_trainer_reordered_graph_learns():
    """End-to-end sharded training THROUGH the reorder: split indices and
    labels map through the permutation, halo on by default."""
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=200, num_edges=1600, num_features=16,
                           num_classes=4, seed=3)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes, reorder=True)
    cfg = SGFormerConfig(32, 4, gnn="graphconv", axis_name="sp",
                         trans_dropout=0.1, gnn_dropout=0.1)
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=30, eval_step=5, runs=1,
                     display_step=-1)
    trainer = ShardedTrainer(
        model, g, ds.graph["node_feat"], ds.label, tc,
        mesh=make_mesh((N_DEV,), ("sp",)),
    )
    assert trainer.graph.halo_send_idx is not None  # halo default ON
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.run_summary(0)["final_test"] > 0.5


def test_sharded_fused_multi_step_matches_single_steps(problem):
    """eval_step>1 runs sharded epoch blocks as ONE shard_map dispatch
    (make_sharded_multi_step: key chain + lax.scan inside the SPMD
    program); metrics match the per-epoch sharded loop exactly, losses up
    to reduction order."""
    g, x, label = problem

    class _PlainSharded(ShardedTrainer):
        """Per-epoch loop forced via the _fused_steps opt-out."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._fused_steps = False

    def run(cls):
        cfg = SGFormerConfig.large(16, 4, gnn_num_layers=2, axis_name="sp")
        tc = TrainConfig(lr=0.02, epochs=8, eval_step=3, seed=5,
                         display_step=-1)
        trainer = cls(
            SGFormer(cfg), g, x, label, tc,
            mesh=make_mesh((N_DEV,), ("sp",)),
        )
        rng = np.random.default_rng(0)
        split = {
            "train": np.arange(0, 50, 2),
            "valid": np.arange(1, 50, 4),
            "test": np.arange(3, 50, 4),
        }
        logger = trainer.fit([split])
        return trainer, logger.results[0]

    fused_tr, fused = run(ShardedTrainer)
    plain_tr, plain = run(_PlainSharded)
    assert fused_tr._multi_steps
    assert len(fused) == len(plain) > 1
    for f_res, p_res in zip(fused, plain):
        assert f_res[:3] == p_res[:3]
        np.testing.assert_allclose(f_res[3], p_res[3], rtol=1e-5)
