"""End-to-end trainer tests on synthetic homophilous graphs: loss decreases,
accuracy beats chance, logger selects the right epoch, metrics behave."""

import numpy as np

import jax

from sgformer_tpu.data.loaders import synthetic_dataset
from sgformer_tpu.data.metrics import count_correct, eval_acc, eval_f1, eval_rocauc
from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.nn import SGFormer, SGFormerConfig
from sgformer_tpu.train import RunLogger, TrainConfig, Trainer


def _make_problem(gnn="graphconv", n=300, f=16, c=4):
    ds = synthetic_dataset(
        num_nodes=n, num_edges=4 * n, num_features=f, num_classes=c, seed=1
    )
    g = preprocess_graph(
        ds.graph["edge_index"], n, with_pyg_norm=(gnn == "gcn")
    )
    return ds, g


def test_full_graph_training_learns():
    ds, g = _make_problem()
    cfg = SGFormerConfig.large(32, ds.num_classes, trans_dropout=0.2, gnn_dropout=0.2)
    model = SGFormer(cfg)
    tcfg = TrainConfig(lr=0.01, epochs=60, eval_step=5, runs=1, display_step=-1)
    trainer = Trainer(
        model, g, ds.graph["node_feat"], ds.label, tcfg
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    s = logger.run_summary(0)
    # Synthetic graph is highly homophilous + features informative: the
    # model must clearly beat chance (1/4).
    assert s["final_test"] > 0.5, s
    # loss trajectory: valid loss at best epoch below the first epoch's
    first_vloss = logger.results[0][0][3]
    best_vloss = min(r[3] for r in logger.results[0])
    assert best_vloss < first_vloss


def test_training_medium_tier_gcn_backbone():
    ds, g = _make_problem(gnn="gcn")
    cfg = SGFormerConfig.medium(32, ds.num_classes, trans_dropout=0.2, gnn_dropout=0.2)
    model = SGFormer(cfg)
    tcfg = TrainConfig(lr=0.01, epochs=40, eval_step=5, runs=1)
    trainer = Trainer(model, g, ds.graph["node_feat"], ds.label, tcfg)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.run_summary(0)["final_test"] > 0.4


def test_multi_run_and_early_stop():
    ds, g = _make_problem(n=150)
    cfg = SGFormerConfig.large(16, ds.num_classes)
    model = SGFormer(cfg)
    tcfg = TrainConfig(lr=0.01, epochs=30, eval_step=1, runs=2, patience=5)
    trainer = Trainer(model, g, ds.graph["node_feat"], ds.label, tcfg)
    splits = [
        ds.get_idx_split(rng=np.random.default_rng(i)) for i in range(2)
    ]
    logger = trainer.fit(splits)
    stats = logger.statistics()
    assert "final_test" in stats
    assert all(len(r) > 0 for r in logger.results)


def test_logger_model_selection():
    lg = RunLogger(1, mode="max_acc")
    lg.add_result(0, (0.9, 0.5, 0.60, 1.0))
    lg.add_result(0, (0.95, 0.8, 0.70, 0.5))
    lg.add_result(0, (0.99, 0.7, 0.80, 0.4))
    s = lg.run_summary(0)
    assert s["best_epoch"] == 1
    assert s["final_test"] == 0.70
    assert s["highest_train"] == 0.99

    lg2 = RunLogger(1, mode="min_loss")
    lg2.results = lg.results
    assert lg2.best_epoch(0) == 2


def test_metrics():
    y = np.array([[0], [1], [1], [0]])
    logits = np.array([[2.0, -1.0], [0.0, 3.0], [1.0, 0.0], [5.0, 1.0]])
    assert eval_acc(y, logits) == 0.75
    auc = eval_rocauc(y, logits)
    assert 0.0 <= auc <= 1.0
    f1 = eval_f1(y, logits)
    assert 0.0 <= f1 <= 1.0
    total, correct = count_correct(y, logits)
    assert (total, correct) == (4, 3)


def test_eval_acc_nan_skip():
    y = np.array([[0.0], [np.nan], [1.0]])
    logits = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    assert eval_acc(y, logits) == 1.0


def test_dual_weight_decay_param_groups():
    from sgformer_tpu.train.optim import branch_mask

    ds, g = _make_problem(n=60)
    cfg = SGFormerConfig.large(8, 3)
    model = SGFormer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((60, 16), np.float32),
        g,
        train=False,
    )
    tmask = branch_mask(variables["params"], "trans")
    gmask = branch_mask(variables["params"], "gnn")
    leaves_t = jax.tree_util.tree_leaves(tmask)
    leaves_g = jax.tree_util.tree_leaves(gmask)
    assert any(leaves_t) and any(leaves_g)
    # masks are complementary
    assert all(a != b for a, b in zip(leaves_t, leaves_g))


def test_training_is_deterministic():
    """Same seed → bit-identical training trajectory (the reference seeds
    once globally and drifts across runs, SURVEY §8; jax PRNG threading
    makes determinism exact)."""
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train import TrainConfig, Trainer

    ds = synthetic_dataset(num_nodes=150, num_edges=900, num_features=8,
                           num_classes=3, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    split = ds.get_idx_split(rng=np.random.default_rng(0))

    def run():
        model = SGFormer(SGFormerConfig.large(16, 3))
        tc = TrainConfig(lr=0.01, epochs=5, eval_step=1, seed=7,
                         display_step=-1)
        trainer = Trainer(model, g, ds.graph["node_feat"], ds.label, tc)
        return trainer.fit([split]).results[0]

    a, b = run(), run()
    assert a == b  # exact equality, every epoch's metrics


def test_fused_multi_step_matches_single_steps():
    """eval_step>1 runs epoch blocks as ONE lax.scan dispatch
    (Trainer._build_multi_step); the dropout-key chain reproduces the
    per-epoch loop, so trajectories match single steps exactly up to
    XLA reduction-order differences between the scanned and standalone
    compilations (~1 ulp on the loss)."""
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=150, num_edges=900, num_features=8,
                           num_classes=3, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    split = ds.get_idx_split(rng=np.random.default_rng(0))

    class _PlainTrainer(Trainer):
        """Overriding _build_steps disables the fused path (the fit gate
        requires the base implementation)."""

        def _build_steps(self, tx):
            return Trainer._build_steps(self, tx)

    def run(cls):
        model = SGFormer(SGFormerConfig.large(16, 3))
        tc = TrainConfig(lr=0.01, epochs=8, eval_step=3, seed=7,
                         display_step=-1)
        trainer = cls(model, g, ds.graph["node_feat"], ds.label, tc)
        logger = trainer.fit([split])
        return trainer, logger.results[0]

    fused_tr, fused = run(Trainer)
    plain_tr, plain = run(_PlainTrainer)
    assert fused_tr._multi_steps and not plain_tr._multi_steps
    assert len(fused) == len(plain) > 1
    for f_res, p_res in zip(fused, plain):
        # metrics (accuracies) exactly equal; the valid-loss float may
        # drift ~1 ulp from scan-vs-standalone reduction tiling
        assert f_res[:3] == p_res[:3]
        np.testing.assert_allclose(f_res[3], p_res[3], rtol=1e-5)


def test_fused_multi_step_without_batchnorm():
    """BN-less models (empty batch_stats) must run the fused scan path:
    the FrozenDict/dict carry-structure mismatch regression."""
    from sgformer_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset(num_nodes=120, num_edges=700, num_features=8,
                           num_classes=3, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    model = SGFormer(SGFormerConfig.large(16, 3, gnn_use_bn=False,
                                          trans_use_bn=False))
    tc = TrainConfig(lr=0.01, epochs=6, eval_step=3, seed=7,
                     display_step=-1)
    trainer = Trainer(model, g, ds.graph["node_feat"], ds.label, tc)
    logger = trainer.fit([split])
    assert trainer._multi_steps
    assert len(logger.results[0]) >= 2
