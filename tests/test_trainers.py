"""Batched + neighbor-sampled training paths (reference semantics of
large/main-batch.py and 100M/nb-sample.py) on synthetic learnable graphs,
plus checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.data.loaders import synthetic_dataset
from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.nn import SGFormer, SGFormerConfig
from sgformer_tpu.sample.neighbor import CSRGraph, NeighborSampler
from sgformer_tpu.train import (
    BatchTrainConfig,
    BatchTrainer,
    build_subgraph_batch,
    SampledTrainConfig,
    SampledTrainer,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(
        num_nodes=600, num_edges=5000, num_features=16, num_classes=4, seed=1
    )


def _undirected(edge_index, n):
    from sgformer_tpu.graph import add_self_loops, remove_self_loops, to_undirected

    e = to_undirected(edge_index)
    e = remove_self_loops(e)
    return add_self_loops(e, n)


def test_batch_trainer_learns(ds):
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    full_graph = preprocess_graph(ds.graph["edge_index"], n)
    cfg = BatchTrainConfig(
        lr=0.01, epochs=25, eval_step=5, batch_size=200, ladder_base=1024,
        display_step=-1,
    )
    model = SGFormer(SGFormerConfig.large(32, ds.num_classes))
    trainer = BatchTrainer(
        model, edge_index, ds.graph["node_feat"], ds.label, cfg,
        full_graph=full_graph,
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.run_summary(0)["final_test"] > 0.5


def test_batch_trainer_streaming_eval(ds):
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    cfg = BatchTrainConfig(
        lr=0.01, epochs=6, eval_step=5, batch_size=200, ladder_base=1024,
        eval_mode="batch", display_step=-1,
    )
    model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
    trainer = BatchTrainer(model, edge_index, ds.graph["node_feat"], ds.label, cfg)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert 0.0 <= logger.run_summary(0)["final_test"] <= 1.0


def test_batch_trainer_tail_batch_trained(ds):
    """n % batch_size != 0: fit must run ceil(n/B) batches per epoch —
    the reference TRAINS the remainder batch (main-batch.py:129); the
    round-4 trainer silently dropped it (VERDICT weak #1)."""
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    full_graph = preprocess_graph(ds.graph["edge_index"], n)
    B = 173  # 600 = 3*173 + 81 → 4 batches, tail of 81
    epochs = 3
    cfg = BatchTrainConfig(
        lr=0.01, epochs=epochs, eval_step=5, batch_size=B,
        ladder_base=1024, display_step=-1,
    )
    model = SGFormer(SGFormerConfig.large(32, ds.num_classes))
    trainer = BatchTrainer(
        model, edge_index, ds.graph["node_feat"], ds.label, cfg,
        full_graph=full_graph,
    )
    trainer.record_losses = True
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    num_batches = n // B + 1
    assert len(trainer.train_losses) == epochs * num_batches
    assert all(np.isfinite(v) for v in trainer.train_losses)
    assert logger.run_summary(0)["final_test"] > 0.4


def test_batch_trainer_bucket_overflow_escalates(ds):
    """A planted hub-clique batch overflows the expected-edges heuristic
    bucket; the trainer must climb the ladder and finish the run instead
    of dying with BucketOverflowError (round-4 VERDICT weak #3)."""
    from sgformer_tpu.train.batch_trainer import BucketOverflowError

    n = ds.num_nodes
    base = _undirected(ds.graph["edge_index"], n)
    # clique on nodes 0..149: 150*149 directed edges — any batch holding
    # all of them carries ~22.5K subgraph edges, far above the heuristic
    k = 150
    cl = np.stack(
        [np.repeat(np.arange(k), k), np.tile(np.arange(k), k)]
    )
    cl = cl[:, cl[0] != cl[1]]
    edge_index = np.concatenate([np.asarray(base), cl], axis=1)
    full_graph = preprocess_graph(ds.graph["edge_index"], n)
    cfg = BatchTrainConfig(
        lr=0.01, epochs=1, eval_step=5, batch_size=k,
        ladder_base=1024, display_step=-1,
    )
    model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
    trainer = BatchTrainer(
        model, edge_index, ds.graph["node_feat"], ds.label, cfg,
        full_graph=full_graph,
    )
    trainer.record_losses = True

    class PlantedPerm:
        def permutation(self, m):
            return np.arange(m)  # first batch = the full clique

    split = ds.get_idx_split(rng=np.random.default_rng(0))
    trainer.fit([split], np_rng=PlantedPerm())  # must not raise
    assert trainer._bucket >= k * (k - 1)  # escalated past the clique
    assert len(trainer.train_losses) == n // k
    assert all(np.isfinite(v) for v in trainer.train_losses)

    # the raw builder still reports overflow loudly when given a fixed
    # bucket (the trainer is what escalates)
    with pytest.raises(BucketOverflowError) as e:
        build_subgraph_batch(edge_index, np.arange(k), n, bucket=1024)
    assert e.value.edges > e.value.cap == 1024
    assert isinstance(e.value, ValueError)  # back-compat contract


def test_neighbor_sampler_subgraph_validity(ds):
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    sampler = NeighborSampler(
        edge_index, n, fanouts=[5, 3], batch_size=50, seed=0
    )
    seeds = np.arange(50)
    batch = sampler.sample(seeds)
    # seeds occupy the first rows, in order
    np.testing.assert_array_equal(batch.node_ids[:50], seeds)
    assert batch.num_nodes <= sampler.node_cap
    # every real (non-padding) edge joins real local nodes
    real = batch.edge_weight > 0
    assert batch.edge_src[real].max(initial=0) < batch.num_nodes
    assert batch.edge_dst[real].max(initial=0) < batch.num_nodes
    # every sampled edge exists in the true graph (ignoring self-loops)
    csr = CSRGraph.from_edge_index(edge_index, n)
    gs = batch.node_ids[batch.edge_src[real]]
    gd = batch.node_ids[batch.edge_dst[real]]
    for s, d in zip(gs[:100], gd[:100]):
        if s == d:
            continue  # self-loop added by the sampler
        nbrs = csr.indices[csr.indptr[d] : csr.indptr[d + 1]]
        assert s in nbrs
    # fanout respected per hop-1 node: count in-edges per seed
    from collections import Counter

    cnt = Counter(batch.edge_dst[real].tolist())
    for seed_local in range(50):
        deg = csr.indptr[seeds[seed_local] + 1] - csr.indptr[seeds[seed_local]]
        assert cnt[seed_local] <= min(deg, 5) + 1  # +1 self-loop


def test_sampled_trainer_learns_and_checkpoints(ds, tmp_path):
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    cfg = SampledTrainConfig(
        lr=0.01, epochs=8, batch_size=100, fanouts=(5, 3),
        save_model=True, model_dir=str(tmp_path / "ckpt"), display_step=-1,
    )
    model = SGFormer(SGFormerConfig.papers100m(32, ds.num_classes))
    trainer = SampledTrainer(model, edge_index, ds.graph["node_feat"], ds.label, cfg)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.run_summary(0)["highest_valid"] > 0.4

    # finetune path restores the saved params
    cfg2 = SampledTrainConfig(
        lr=0.001, epochs=1, batch_size=100, fanouts=(5, 3),
        use_pretrained=True, model_dir=str(tmp_path / "ckpt"), display_step=-1,
    )
    trainer2 = SampledTrainer(model, edge_index, ds.graph["node_feat"], ds.label, cfg2)
    logger2 = trainer2.fit([split])
    # restored model should start near the pretrained quality
    assert logger2.run_summary(0)["highest_valid"] > 0.4


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
    }
    save_checkpoint(str(tmp_path / "c1"), state, step=7)
    restored = load_checkpoint(str(tmp_path / "c1"))
    assert restored["step"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored["state"]["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )


def test_sampled_trainer_with_feature_store(ds, tmp_path):
    """Memory-mapped features drive the sampled trainer unchanged."""
    from sgformer_tpu.data import FeatureStore

    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    store = FeatureStore.create(
        str(tmp_path / "feat.bin"), ds.graph["node_feat"]
    )
    assert len(store) == n and store.shape[1] == 16
    cfg = SampledTrainConfig(
        lr=0.01, epochs=2, batch_size=100, fanouts=(5, 3), display_step=-1
    )
    model = SGFormer(SGFormerConfig.papers100m(16, ds.num_classes))
    trainer = SampledTrainer(model, edge_index, store, ds.label, cfg)
    assert trainer.x is store  # not materialized
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.results[0]


def test_sampled_trainer_bf16_feature_store(ds, tmp_path):
    """A bf16 FeatureStore (half disk + gather IO) drives the bf16-path
    sampled trainer: rows pass through uncast (the model casts x to bf16
    at entry anyway), while an f32-path trainer always receives f32 rows
    (the exactness invariant)."""
    import ml_dtypes

    from sgformer_tpu.data import FeatureStore

    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    store = FeatureStore.create(
        str(tmp_path / "feat16.bin"), ds.graph["node_feat"],
        dtype=ml_dtypes.bfloat16,
    )
    assert store.dtype == ml_dtypes.bfloat16
    assert store[np.arange(4)].dtype == ml_dtypes.bfloat16

    cfg = SampledTrainConfig(
        lr=0.01, epochs=2, batch_size=100, fanouts=(5, 3), display_step=-1
    )
    model16 = SGFormer(
        SGFormerConfig.papers100m(16, ds.num_classes, compute_dtype="bf16")
    )
    tr16 = SampledTrainer(model16, edge_index, store, ds.label, cfg)
    assert tr16._gather_x(np.arange(4)).dtype == ml_dtypes.bfloat16
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = tr16.fit([split])
    assert logger.results[0]

    # f32-path trainer on the same store still receives f32 rows
    model32 = SGFormer(SGFormerConfig.papers100m(16, ds.num_classes))
    tr32 = SampledTrainer(model32, edge_index, store, ds.label, cfg)
    assert tr32._gather_x(np.arange(4)).dtype == np.float32


def test_batch_subgraph_pallas_chunks_match_xla(ds):
    """Fixed-shape chunk plans on batch subgraphs: same aggregation as the
    XLA path, identical plan shapes across different batches."""
    from sgformer_tpu.kernels.spmm import chunked_spmm
    from sgformer_tpu.ops.spmm import spmm

    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    rng = np.random.default_rng(3)
    shapes = set()
    for _ in range(3):
        bidx = rng.permutation(n)[:200]
        g = build_subgraph_batch(
            edge_index, bidx, n, bucket=2048, use_pallas=True,
            chunk_dtype="f32", chunk_interpret=True,
        )
        shapes.add(tuple(g.chunks.fwd.gather_idx.shape))
        x = jnp.asarray(rng.standard_normal((200, 16)).astype(np.float32))
        want = spmm(x, g.edge_src, g.edge_dst, g.gcn_weight, 200)
        got = g.propagate(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
    assert len(shapes) == 1  # one compiled step shape for all batches


def test_batch_trainer_pallas_mode(ds):
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    cfg = BatchTrainConfig(
        lr=0.01, epochs=6, eval_step=5, batch_size=200, ladder_base=1024,
        eval_mode="batch", display_step=-1, use_pallas=True,
    )
    model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
    trainer = BatchTrainer(model, edge_index, ds.graph["node_feat"], ds.label, cfg)
    assert trainer.chunk_interpret  # CPU test environment
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.results[0]


def test_batch_trainer_cpu_eval_offload(ds):
    """evaluate_large semantics: full-graph eval runs on the host device."""
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    full_graph = preprocess_graph(ds.graph["edge_index"], n)
    cfg = BatchTrainConfig(
        lr=0.01, epochs=2, eval_step=1, batch_size=200, ladder_base=1024,
        eval_device="cpu", display_step=-1,
    )
    model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
    trainer = BatchTrainer(
        model, edge_index, ds.graph["node_feat"], ds.label, cfg,
        full_graph=full_graph,
    )
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.results[0]


def test_native_sampler_matches_numpy_invariants(ds):
    """C++ full-batch sampler (csrc::sample_batch) upholds every
    structural invariant of the numpy oracle: seeds-first relabel,
    dst-sorted edges, self-loops on all real nodes, gcn-norm weights,
    static padding conventions."""
    from sgformer_tpu.graph import gcn_norm_weights
    from sgformer_tpu.native.build import native_available

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    for use_native in (True, False):
        sampler = NeighborSampler(
            edge_index, n, fanouts=[5, 3], batch_size=50, seed=0,
            use_native=use_native,
        )
        b = sampler.sample(np.arange(50))
        np.testing.assert_array_equal(b.node_ids[:50], np.arange(50))
        real = b.edge_weight > 0
        # dst-sorted
        assert (np.diff(b.edge_dst[real.nonzero()[0]]) >= 0).all()
        # self-loop on every real node
        loops = set(
            b.edge_src[real][b.edge_src[real] == b.edge_dst[real]].tolist()
        )
        assert loops == set(range(b.num_nodes))
        # weights match gcn_norm_weights on the real edge set
        e = int(real.sum())
        w_want = gcn_norm_weights(
            b.edge_src[:e], b.edge_dst[:e], b.num_nodes
        )
        np.testing.assert_allclose(b.edge_weight[:e], w_want, rtol=1e-5)
        # padding conventions
        assert (b.edge_weight[e:] == 0).all()
        assert (b.node_mask[: b.num_nodes] == 1).all()
        assert (b.node_mask[b.num_nodes:] == 0).all()


def test_parallel_epoch_matches_serial_order(ds):
    """Threaded epoch yields the same number of batches, each valid."""
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    sampler = NeighborSampler(edge_index, n, fanouts=[4, 3],
                              batch_size=40, seed=1)
    pool = np.arange(n)
    serial = list(sampler.epoch(pool, shuffle=False, workers=0))
    threaded = list(
        NeighborSampler(edge_index, n, fanouts=[4, 3], batch_size=40,
                        seed=1).epoch(pool, shuffle=False, workers=4)
    )
    assert len(serial) == len(threaded) == n // 40
    for i, b in enumerate(threaded):
        np.testing.assert_array_equal(
            b.node_ids[: b.num_seeds],
            pool[i * 40: (i + 1) * 40],
        )


def test_batch_trainer_deterministic(ds):
    """Same seed → identical batch-trainer trajectory (VERDICT r1 task 4:
    golden trajectory coverage beyond the full-graph trainer)."""
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    split = ds.get_idx_split(rng=np.random.default_rng(0))

    def run():
        cfg = BatchTrainConfig(
            lr=0.01, epochs=4, eval_step=2, batch_size=150,
            ladder_base=1024, display_step=-1, seed=11, eval_mode="batch",
        )
        model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
        trainer = BatchTrainer(model, edge_index, ds.graph["node_feat"],
                               ds.label, cfg)
        return trainer.fit([split]).results[0]

    a, b = run(), run()
    assert a == b


def test_sampled_trainer_deterministic(ds):
    n = ds.num_nodes
    edge_index = _undirected(ds.graph["edge_index"], n)
    split = ds.get_idx_split(rng=np.random.default_rng(0))

    def run():
        cfg = SampledTrainConfig(
            lr=0.01, epochs=3, batch_size=100, fanouts=(5, 3),
            eval_step=2, display_step=-1, seed=13,
        )
        model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
        trainer = SampledTrainer(model, edge_index, ds.graph["node_feat"],
                                 ds.label, cfg)
        return trainer.fit([split]).results[0]

    a, b = run(), run()
    assert a == b


def test_fast_path_accuracy_drift_bounded(ds):
    """bf16 / pallas-chunk / slab fast paths converge to the same final
    test accuracy as the f32 XLA default within 0.05 on the synthetic
    recipe — the quantified fast-path-drift bound (VERDICT r1 task 4b;
    run.sh accuracy reproduction stays dataset-gated)."""
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.train import TrainConfig, Trainer

    n = ds.num_nodes
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    tc = TrainConfig(lr=0.02, epochs=25, eval_step=25, seed=5,
                     display_step=-1)

    def final_acc(**pp):
        g = preprocess_graph(ds.graph["edge_index"], n,
                             chunk_interpret=True, **pp)
        model = SGFormer(
            SGFormerConfig.large(
                32, ds.num_classes,
                compute_dtype="bf16" if pp.get("with_chunks") else "f32",
            )
        )
        trainer = Trainer(model, g, ds.graph["node_feat"], ds.label, tc)
        return trainer.fit([split]).run_summary(0)["final_test"]

    acc_f32 = final_acc()
    acc_chunk = final_acc(with_chunks=True, chunk_dtype="bf16")
    acc_slab = final_acc(with_chunks=True, spmm_mode="slab",
                         chunk_dtype="bf16", slab_rows=256)
    assert acc_f32 > 0.6
    assert abs(acc_chunk - acc_f32) <= 0.05, (acc_chunk, acc_f32)
    assert abs(acc_slab - acc_f32) <= 0.05, (acc_slab, acc_f32)


def test_batch_step_matches_full_graph_oracle(ds):
    """Golden cross-trainer anchor (VERDICT r1 task 4): a BatchTrainer
    step over the WHOLE graph as one batch computes the same loss and the
    same updated parameters as the full-graph Trainer step — the batch
    path's subgraph building, padding, masking, and optimizer wiring
    reproduce the reference `large/main-batch.py` math with no drift."""
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.train import TrainConfig, Trainer
    from sgformer_tpu.train.batch_trainer import build_subgraph_batch

    n = ds.num_nodes
    g_full = preprocess_graph(ds.graph["edge_index"], n)
    # identical edge set for the batch path (post undirected+self-loops)
    ei = np.asarray(g_full.edge_index)
    g_batch = build_subgraph_batch(ei, np.arange(n), n)
    split = ds.get_idx_split(rng=np.random.default_rng(0))

    cfg = SGFormerConfig.large(16, ds.num_classes, trans_dropout=0.0,
                               gnn_dropout=0.0)
    model = SGFormer(cfg)

    tc = TrainConfig(lr=0.01, epochs=1, eval_step=10, display_step=-1)
    tr_full = Trainer(model, g_full, ds.graph["node_feat"], ds.label, tc)
    st_f, tx_f, opt_f = tr_full.init_state(jax.random.PRNGKey(0))
    step_f, _ = tr_full._build_steps(tx_f)

    bc = BatchTrainConfig(lr=0.01, epochs=1, batch_size=n, eval_step=10,
                          display_step=-1)
    tr_b = BatchTrainer(model, ei, ds.graph["node_feat"], ds.label, bc)
    # mirror BatchTrainer.fit's inline init (same rng -> identical params)
    from sgformer_tpu.train.optim import dual_weight_decay_adam

    variables = jax.jit(
        lambda r, x, g: model.init({"params": r}, x, g, train=False)
    )(jax.random.PRNGKey(0), jnp.asarray(ds.graph["node_feat"]), g_batch)
    st_b = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    tx_b = dual_weight_decay_adam(variables["params"], bc.lr,
                                  bc.trans_weight_decay,
                                  bc.gnn_weight_decay)
    opt_b = tx_b.init(variables["params"])
    step_b = tr_b._train_step_for(tx_b)

    for a, b in zip(jax.tree_util.tree_leaves(st_f["params"]),
                    jax.tree_util.tree_leaves(st_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    train_idx = jnp.asarray(split["train"])
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(split["train"])] = True

    rng = jax.random.PRNGKey(7)
    st_f2, opt_f2, loss_f = step_f(st_f, opt_f, rng, train_idx)
    st_b2, opt_b2, loss_b = step_b(
        st_b, opt_b, rng, jnp.asarray(ds.graph["node_feat"]), g_batch,
        jnp.asarray(np.asarray(ds.label).reshape(-1).astype(np.int32)),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_f2["params"]),
                    jax.tree_util.tree_leaves(st_b2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sampled_full_fanout_matches_full_graph_oracle(ds):
    """Golden sampled-path anchor (VERDICT r1 task 4): with seeds = ALL
    nodes and fanout >= max in-degree, the sampled batch IS the full graph
    — its relabeling, self-loops, degree norm, and masking must reproduce
    the full-graph Trainer's eval logits exactly."""
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.sample.neighbor import NeighborSampler
    from sgformer_tpu.train import TrainConfig, Trainer
    from sgformer_tpu.train.sampled_trainer import batch_graph

    n = ds.num_nodes
    g_full = preprocess_graph(ds.graph["edge_index"], n)
    ei_nl = np.asarray(g_full.edge_index)
    # sampler input: the undirected no-self-loop edge list (it re-adds
    # self-loops itself, mirroring 100M/nb-sample.py:79-80)
    m = ei_nl[0] != ei_nl[1]
    ei_nl = ei_nl[:, m]
    deg = np.bincount(ei_nl[1], minlength=n)
    fan = int(deg.max()) + 1

    sampler = NeighborSampler(ei_nl, n, fanouts=(fan, fan), batch_size=n,
                              node_cap=n, edge_cap=len(ei_nl[0]) + n + 8,
                              seed=0)
    batch = sampler.sample(np.arange(n))
    assert int(batch.num_nodes) == n
    # every edge sampled: count non-padding slots
    assert int((batch.edge_weight != 0).sum()) >= len(ei_nl[0]) + n

    cfg = SGFormerConfig.large(16, ds.num_classes, trans_dropout=0.0,
                               gnn_dropout=0.0)
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=1, eval_step=10, display_step=-1)
    trainer = Trainer(model, g_full, ds.graph["node_feat"], ds.label, tc)
    state, tx, _ = trainer.init_state(jax.random.PRNGKey(0))
    _, eval_full = trainer._build_steps(tx)
    want = np.asarray(eval_full(state))

    gb = batch_graph(batch)
    x_b = jnp.asarray(np.asarray(ds.graph["node_feat"])[batch.node_ids])
    got = np.asarray(model.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        x_b, gb, train=False,
        node_mask=jnp.asarray(batch.node_mask),
    ))
    # map back: row i of the batch is node_ids[i]
    np.testing.assert_allclose(got, want[np.asarray(batch.node_ids)],
                               rtol=2e-4, atol=2e-5)


def test_rbg_rng_trains(ds):
    """The TPU-default rbg bit generator (utils/rng.py) drives the same
    training loop: typed rbg keys thread through jitted init, dropout
    splits, and flax rng dicts, and the model still learns."""
    from sgformer_tpu.train import TrainConfig, Trainer
    from sgformer_tpu.utils.rng import train_key

    # auto on CPU stays threefry (cross-backend determinism for the suite)
    auto = train_key(3)
    assert "threefry" in str(jax.random.key_impl(auto))
    rbg = train_key(3, "rbg")
    assert "rbg" in str(jax.random.key_impl(rbg))

    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    cfg = SGFormerConfig(16, ds.num_classes, gnn="graphconv")
    tc = TrainConfig(lr=0.01, epochs=30, eval_step=10, display_step=-1)
    trainer = Trainer(SGFormer(cfg), g, ds.graph["node_feat"], ds.label, tc)
    logger = trainer.fit([ds.get_idx_split(rng=np.random.default_rng(0))],
                         rng=rbg)
    assert logger.run_summary(0)["final_test"] > 0.5


def test_streaming_eval_bucket_overflow_escalates(ds):
    """The eval sweep's bucket escalates independently of training: a
    hub-clique eval batch overflowing the heuristic bucket must rebuild
    at a larger rung inside the prefetch producer instead of killing the
    sweep (round-5; the train side has its own test above)."""
    n = ds.num_nodes
    base = _undirected(ds.graph["edge_index"], n)
    k = 150
    cl = np.stack([np.repeat(np.arange(k), k), np.tile(np.arange(k), k)])
    cl = cl[:, cl[0] != cl[1]]
    edge_index = np.concatenate([np.asarray(base), cl], axis=1)
    cfg = BatchTrainConfig(
        lr=0.01, epochs=1, eval_step=1, batch_size=k, ladder_base=1024,
        eval_mode="batch", display_step=-1,
    )
    model = SGFormer(SGFormerConfig.large(16, ds.num_classes))
    trainer = BatchTrainer(
        model, edge_index, ds.graph["node_feat"], ds.label, cfg,
    )
    trainer._bucket = trainer._eval_bucket = 2048  # too small for the clique
    warm = trainer._build_batch(np.arange(k))  # escalates the TRAIN bucket
    variables = jax.jit(
        lambda r, x, g: model.init({"params": r}, x, g, train=False)
    )(jax.random.PRNGKey(0),
      jnp.asarray(np.asarray(ds.graph["node_feat"])[:k]), warm)
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    split = ds.get_idx_split(rng=np.random.default_rng(0))

    class CliqueFirst:
        def permutation(self, m):
            return np.arange(m)  # first eval batch = the clique

    assert trainer._eval_bucket == 2048
    accs = trainer._eval_streaming(state, split, CliqueFirst())
    assert trainer._eval_bucket >= k * (k - 1)  # escalated
    assert all(0.0 <= v <= 1.0 for v in accs.values())
