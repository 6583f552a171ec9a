"""Feature/adjacency transforms and the time-test harness."""

import numpy as np

import jax.numpy as jnp

from sgformer_tpu.data.transforms import (
    adj_mul,
    augment_node_features,
    compute_sgc_features,
    convert_to_adj,
    gen_normalized_adjs,
    normalize_features,
)

import reference_numpy as ref


def test_normalize_features_rows_sum_to_one():
    x = np.abs(np.random.default_rng(0).standard_normal((10, 5))).astype(np.float32)
    y = normalize_features(x)
    np.testing.assert_allclose(y.sum(1), 1.0, rtol=1e-5)


def test_sgc_features_match_dense():
    rng = np.random.default_rng(1)
    n = 30
    e = ref.random_graph(rng, n, 120)
    x = rng.standard_normal((n, 6)).astype(np.float32)
    got = compute_sgc_features(e, x, num_props=2)

    from sgformer_tpu.graph import add_self_loops, remove_self_loops

    ee = add_self_loops(remove_self_loops(e), n)
    row, col = ee
    deg = np.bincount(row, minlength=n).astype(np.float64)
    coef = 1.0 / np.sqrt(np.maximum(deg[row] * deg[col], 1.0))
    a = np.zeros((n, n))
    for c, r, cf in zip(col, row, coef):
        a[r, c] += cf
    want = a @ (a @ x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_augment_node_features_shapes():
    rng = np.random.default_rng(2)
    n = 20
    e = ref.random_graph(rng, n, 60)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    y = augment_node_features(e, x, use_identity_features=True)
    assert y.shape == (n, 4 + n)
    y2 = augment_node_features(
        e, x, use_adjacency_features=True, do_not_use_original_features=True
    )
    assert y2.shape == (n, n)


def test_adj_mul_two_hop():
    e = np.asarray([[0, 1], [1, 2]])  # 0->1->2
    e2 = adj_mul(e, 3, power=2)
    assert (0, 2) in set(zip(e2[0].tolist(), e2[1].tolist()))


def test_convert_to_adj_and_norms():
    rng = np.random.default_rng(3)
    n = 15
    e = ref.random_graph(rng, n, 40)
    adj = convert_to_adj(e, n)
    assert adj.shape == (n, n)
    (src, dst, w_dad), _, _ = gen_normalized_adjs(e, n)
    assert np.all(np.isfinite(w_dad))


def test_time_test_harness():
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train import TrainConfig, Trainer
    from sgformer_tpu.train.timing import time_test

    ds = synthetic_dataset(num_nodes=150, num_edges=900, num_features=8,
                           num_classes=3, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    model = SGFormer(SGFormerConfig.large(16, 3))
    trainer = Trainer(model, g, ds.graph["node_feat"], ds.label,
                      TrainConfig(lr=0.01))
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    res = time_test(trainer, split, epochs=5, warmup=1)
    assert res.per_epoch_ms > 0
    assert res.forward_ms > 0
    assert res.edges_per_sec > 0
