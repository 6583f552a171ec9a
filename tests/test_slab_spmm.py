"""Slab SpMM: exactness vs the XLA segment-sum oracle (fwd + grad), the
clustering/packing reorder, and plan invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgformer_tpu.kernels.slabs import (
    build_slabs,
    cluster_pack_perm,
    label_propagation,
    locality_fraction,
    reorder_for_slabs,
)
from sgformer_tpu.kernels.slab_spmm import slab_spmm
from sgformer_tpu.ops.spmm import spmm

import reference_numpy as ref


def _clustered_graph(rng, n=600, e=4000, k=6, homophily=0.85):
    """Planted-partition edge list + gcn weights, dst-sorted, with
    self-loops (the preprocess_graph output shape)."""
    lab = rng.integers(0, k, n)
    src = rng.integers(0, n, e)
    same = rng.random(e) < homophily
    partners = [np.nonzero(lab == c)[0] for c in range(k)]
    dst_same = np.array([rng.choice(partners[lab[s]]) for s in src])
    dst = np.where(same, dst_same, rng.integers(0, n, e))
    both = np.concatenate(
        [np.stack([src, dst]), np.stack([dst, src])], axis=1
    )
    loop = np.arange(n)
    ei = np.concatenate([both, np.stack([loop, loop])], axis=1)
    # dedupe
    key = ei[1] * n + ei[0]
    _, keep = np.unique(key, return_index=True)
    ei = ei[:, keep]
    order = np.argsort(ei[1], kind="stable")
    s, d = ei[0][order], ei[1][order]
    deg = np.bincount(d, minlength=n).astype(np.float64)
    w = (1 / np.sqrt(deg[d] * deg[s])).astype(np.float32)
    return s, d, w, lab


PARAMS = dict(window_rows=64, block_rows=64, chunk_edges=128,
              chunks_per_step=2, slab_rows=256)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    s, d, w, lab = _clustered_graph(rng)
    n = 600
    perm, inv = reorder_for_slabs(np.stack([s, d]), n, slab_rows=256,
                                  iters=30)
    s2, d2 = inv[s], inv[d]
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w[order]
    plan = build_slabs(s2, d2, w2, n, **PARAMS)
    x = rng.standard_normal((n, 32)).astype(np.float32)
    return s2, d2, w2, n, plan, x


def test_reorder_improves_locality(problem):
    s2, d2, w2, n, plan, x = problem
    assert locality_fraction(s2, d2, 256) > 0.5


def test_slab_fwd_exact_f32(problem):
    s2, d2, w2, n, plan, x = problem
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.float32, interpret=True))
    assert got.shape == (n, 32)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_slab_fwd_bf16_close(problem):
    s2, d2, w2, n, plan, x = problem
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.bfloat16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_slab_grad_exact_f32(problem):
    s2, d2, w2, n, plan, x = problem
    co = np.random.default_rng(3).standard_normal((n, 32)).astype(np.float32)

    def f_slab(xx):
        return jnp.sum(slab_spmm(xx, plan, compute_dtype=jnp.float32,
                                 interpret=True) * co)

    def f_ref(xx):
        return jnp.sum(spmm(xx, jnp.asarray(s2), jnp.asarray(d2),
                            jnp.asarray(w2), n) * co)

    g1 = np.asarray(jax.grad(f_slab)(jnp.asarray(x)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-5)


def test_slab_under_jit_and_remat(problem):
    """The plan is a pytree argument; jit + checkpoint re-tracing works."""
    s2, d2, w2, n, plan, x = problem

    @jax.jit
    def step(xx, p):
        f = jax.checkpoint(
            lambda z: jnp.sum(
                slab_spmm(z, p, compute_dtype=jnp.float32, interpret=True)
                ** 2
            )
        )
        return jax.grad(f)(xx)

    g = step(jnp.asarray(x), plan)
    assert np.isfinite(np.asarray(g)).all()


def test_all_local_graph_has_no_remote():
    """A graph with only intra-slab edges produces remote=None."""
    rng = np.random.default_rng(0)
    n = 256  # one slab
    s = rng.integers(0, n, 900)
    d = rng.integers(0, n, 900)
    m = s != d
    s, d = s[m], d[m]
    order = np.argsort(d, kind="stable")
    s, d = s[order], d[order]
    w = np.ones(len(s), dtype=np.float32)
    plan = build_slabs(s, d, w, n, **PARAMS)
    assert plan.fwd.remote is None and plan.bwd.remote is None
    x = rng.standard_normal((n, 16)).astype(np.float32)
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(d),
                           jnp.asarray(w), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_label_propagation_recovers_planted_partition():
    rng = np.random.default_rng(5)
    s, d, w, lab = _clustered_graph(rng, n=400, e=4000, k=4)
    m = s != d
    cl = label_propagation(s[m], d[m], 400, iters=40)
    intra = np.mean(cl[s[m]] == cl[d[m]])
    assert intra > 0.6, intra


def test_cluster_pack_perm_is_permutation():
    clusters = np.array([0, 1, 0, 2, 1, 1, 2, 0])
    perm = cluster_pack_perm(clusters, 4)
    assert sorted(perm.tolist()) == list(range(8))
    # a maximum-size cluster comes first, and clusters stay contiguous
    sizes = np.bincount(clusters)
    assert sizes[clusters[perm[0]]] == sizes.max()
    assert (np.diff(np.nonzero(np.diff(clusters[perm]))[0]) > 0).all()


def test_trainer_slab_mode_matches_plain():
    """End-to-end: slab-mode (clustering reorder + slab kernel) produces
    the SAME logits per original node as the plain path — the forward is
    permutation-equivariant and the Trainer maps indices correctly."""
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train import TrainConfig, Trainer

    ds = synthetic_dataset(num_nodes=300, num_edges=2400, num_features=16,
                           num_classes=4, seed=9)
    g_plain = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    g_slab = preprocess_graph(
        ds.graph["edge_index"], ds.num_nodes, with_chunks=True,
        spmm_mode="slab", slab_rows=128, chunk_dtype="f32",
        chunk_interpret=True,
    )
    assert g_slab.node_perm is not None

    cfg = SGFormerConfig(16, 4, gnn="graphconv", trans_dropout=0.0,
                         gnn_dropout=0.0)
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=1, eval_step=1, display_step=-1)
    tr_plain = Trainer(model, g_plain, ds.graph["node_feat"], ds.label, tc)
    tr_slab = Trainer(model, g_slab, ds.graph["node_feat"], ds.label, tc)

    rng = jax.random.PRNGKey(0)
    st_p, _, _ = tr_plain.init_state(rng)
    st_s, tx, _ = tr_slab.init_state(rng)
    # identical params (init depends on shapes + rng only)
    for a, b in zip(jax.tree_util.tree_leaves(st_p["params"]),
                    jax.tree_util.tree_leaves(st_s["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    _, ev_p = tr_plain._build_steps(tx)
    _, ev_s = tr_slab._build_steps(tx)
    out_p = np.asarray(ev_p(st_p))
    out_s = np.asarray(ev_s(st_s))
    perm = np.asarray(g_slab.node_perm)
    np.testing.assert_allclose(out_s, out_p[perm], rtol=2e-4, atol=2e-4)

    # and training end-to-end learns through the slab kernel
    tc2 = TrainConfig(lr=0.02, epochs=25, eval_step=5, display_step=-1)
    trainer = Trainer(model, g_slab, ds.graph["node_feat"], ds.label, tc2)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    logger = trainer.fit([split])
    assert logger.run_summary(0)["final_test"] > 0.5


# ---------------------------------------------------------------------------
# Streamed-selector (ssel) mode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ssel_problem(problem):
    s2, d2, w2, n, _, x = problem
    plan = build_slabs(s2, d2, w2, n, stream_sel="f32", **PARAMS)
    return s2, d2, w2, n, plan, x


def test_ssel_fwd_exact_f32(ssel_problem):
    s2, d2, w2, n, plan, x = ssel_problem
    assert plan.fwd.meta is None and plan.fwd.sel_src is not None
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_ssel_grad_exact_f32(ssel_problem):
    s2, d2, w2, n, plan, x = ssel_problem
    co = np.random.default_rng(4).standard_normal((n, 32)).astype(np.float32)

    def f_slab(xx):
        return jnp.sum(slab_spmm(xx, plan, compute_dtype=jnp.float32,
                                 interpret=True) * co)

    def f_ref(xx):
        return jnp.sum(spmm(xx, jnp.asarray(s2), jnp.asarray(d2),
                            jnp.asarray(w2), n) * co)

    g1 = np.asarray(jax.grad(f_slab)(jnp.asarray(x)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-5)


def test_ssel_bf16_stream_close(problem):
    s2, d2, w2, n, _, x = problem
    plan = build_slabs(s2, d2, w2, n, stream_sel="bf16", **PARAMS)
    assert plan.fwd.sel_src.dtype == jnp.bfloat16
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.bfloat16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    # f32 compute on a bf16 stream would silently round weights -> error
    with pytest.raises(ValueError, match="f32"):
        slab_spmm(jnp.asarray(x), plan, compute_dtype=jnp.float32,
                  interpret=True)


def test_symmetric_plan_aliases_transpose(problem):
    """GCN-normalized undirected edges are symmetric: the transpose plan
    is elided (bwd None, resolved to fwd) so the selector streams appear
    ONCE in the pytree — duplicate leaves become two XLA parameters and
    double-count multi-GB plans in compile-time HBM accounting
    (round-5 clustered-1M OOM)."""
    s2, d2, w2, n, plan, x = problem
    assert plan.bwd is None
    assert plan.bwd_side is plan.fwd


def test_asymmetric_plan_not_aliased():
    rng = np.random.default_rng(1)
    n = 300
    s = rng.integers(0, n, 800)
    d = rng.integers(0, n, 800)
    m = s != d
    s, d = s[m], d[m]
    order = np.argsort(d, kind="stable")
    s, d = s[order], d[order]
    w = rng.random(len(s)).astype(np.float32)
    plan = build_slabs(s, d, w, n, **PARAMS)
    assert plan.bwd is not plan.fwd
    x = rng.standard_normal((n, 16)).astype(np.float32)
    co = rng.standard_normal((n, 16)).astype(np.float32)

    def f_slab(xx):
        return jnp.sum(slab_spmm(xx, plan, compute_dtype=jnp.float32,
                                 interpret=True) * co)

    def f_ref(xx):
        return jnp.sum(spmm(xx, jnp.asarray(s), jnp.asarray(d),
                            jnp.asarray(w), n) * co)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_slab)(jnp.asarray(x))),
        np.asarray(jax.grad(f_ref)(jnp.asarray(x))),
        rtol=2e-5, atol=2e-5,
    )


def test_trainer_ssel_mode_matches_plain():
    """End-to-end eval through spmm_mode='ssel' equals the plain path."""
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train import TrainConfig, Trainer

    ds = synthetic_dataset(num_nodes=300, num_edges=2400, num_features=16,
                           num_classes=4, seed=9)
    g_plain = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    g_ssel = preprocess_graph(
        ds.graph["edge_index"], ds.num_nodes, with_chunks=True,
        spmm_mode="ssel", slab_rows=128, chunk_dtype="f32",
        chunk_interpret=True,
    )
    assert g_ssel.chunks.fwd.sel_src is not None

    cfg = SGFormerConfig(16, 4, gnn="graphconv", trans_dropout=0.0,
                         gnn_dropout=0.0)
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=1, eval_step=1, display_step=-1)
    tr_plain = Trainer(model, g_plain, ds.graph["node_feat"], ds.label, tc)
    tr_ssel = Trainer(model, g_ssel, ds.graph["node_feat"], ds.label, tc)

    rng = jax.random.PRNGKey(0)
    st_p, _, _ = tr_plain.init_state(rng)
    st_s, tx, _ = tr_ssel.init_state(rng)
    _, ev_p = tr_plain._build_steps(tx)
    _, ev_s = tr_ssel._build_steps(tx)
    out_p = np.asarray(ev_p(st_p))
    out_s = np.asarray(ev_s(st_s))
    perm = np.asarray(g_ssel.node_perm)
    np.testing.assert_allclose(out_s, out_p[perm], rtol=2e-4, atol=2e-4)


def test_ssel_remote_only_windows_pass_through():
    """Windows with NO local chunks emit no grid step in ssel mode; their
    rows must still carry the remote-path partial (the prev->out aliasing
    pass-through), not zeros."""
    rng = np.random.default_rng(2)
    n = 512  # two slabs of 256
    # local edges inside slab 0 only; slab-1 rows receive ONLY cross-slab
    s_loc = rng.integers(0, 256, 600)
    d_loc = rng.integers(0, 256, 600)
    s_rem = rng.integers(0, 256, 300)
    d_rem = rng.integers(256, 512, 300)
    s = np.concatenate([s_loc, s_rem])
    d = np.concatenate([d_loc, d_rem])
    m = s != d
    s, d = s[m], d[m]
    order = np.argsort(d, kind="stable")
    s, d = s[order], d[order]
    w = rng.random(len(s)).astype(np.float32) + 0.5
    plan = build_slabs(s, d, w, n, stream_sel="f32", symmetric=False,
                       **PARAMS)
    x = rng.standard_normal((n, 32)).astype(np.float32)
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(d),
                           jnp.asarray(w), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.float32, interpret=True))
    assert np.abs(want[256:]).sum() > 0  # the remote rows are nonzero
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# Separable int8-selector (sep) mode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sep_problem(problem):
    s2, d2, w2, n, _, x = problem
    deg = np.bincount(d2, minlength=n).astype(np.float64)
    with np.errstate(divide="ignore"):
        rs = (1.0 / np.sqrt(deg)).astype(np.float32)
    rs[~np.isfinite(rs)] = 0.0
    plan = build_slabs(s2, d2, w2, n, stream_sel="bf16", sep_rs=rs,
                       **PARAMS)
    return s2, d2, w2, n, plan, x


def test_sep_plan_is_int8_with_pre_scale(sep_problem):
    s2, d2, w2, n, plan, x = sep_problem
    assert plan.fwd.sel_src.dtype == jnp.int8
    # rs[dst] is hoisted to the post-scale, so the dst stream is 0/1 int8
    assert plan.fwd.sel_dst.dtype == jnp.int8
    assert plan.pre_scale is not None and plan.pre_scale.shape[0] == plan.n_pad


def test_sep_fwd_close(sep_problem):
    s2, d2, w2, n, plan, x = sep_problem
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.bfloat16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_sep_grad_close(sep_problem):
    s2, d2, w2, n, plan, x = sep_problem
    co = np.random.default_rng(5).standard_normal((n, 32)).astype(np.float32)

    def f_slab(xx):
        return jnp.sum(slab_spmm(xx, plan, compute_dtype=jnp.bfloat16,
                                 interpret=True) * co)

    def f_ref(xx):
        return jnp.sum(spmm(xx, jnp.asarray(s2), jnp.asarray(d2),
                            jnp.asarray(w2), n) * co)

    g1 = np.asarray(jax.grad(f_slab)(jnp.asarray(x)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(g1, g2, rtol=0.05, atol=0.05)


def test_sep_falls_back_on_non_separable_weights(problem):
    s2, d2, w2, n, _, x = problem
    rng = np.random.default_rng(9)
    w_rand = (w2 * (0.5 + rng.random(len(w2)))).astype(np.float32)
    rs = np.ones(n, dtype=np.float32)
    plan = build_slabs(s2, d2, w_rand, n, stream_sel="bf16", sep_rs=rs,
                       **PARAMS)
    assert plan.pre_scale is None
    assert plan.fwd.sel_src.dtype == jnp.bfloat16


def test_sep_falls_back_on_f32_stream(problem):
    s2, d2, w2, n, _, x = problem
    deg = np.bincount(d2, minlength=n).astype(np.float64)
    rs = (1.0 / np.sqrt(deg)).astype(np.float32)
    plan = build_slabs(s2, d2, w2, n, stream_sel="f32", sep_rs=rs, **PARAMS)
    assert plan.pre_scale is None and plan.fwd.sel_src.dtype == jnp.float32


# ---------------------------------------------------------------------------
# Hub-resident scratch tail (power-law mode, ssel only)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hub_problem():
    """Power-law endpoints so cross-cluster edges concentrate on hubs."""
    rng = np.random.default_rng(11)
    n, e, k = 600, 4000, 6
    lab = rng.integers(0, k, n)
    pop = (np.arange(1, n + 1, dtype=np.float64) + 5.0) ** -1.2
    pop = rng.permutation(pop / pop.sum())
    src = rng.choice(n, size=e, p=pop)
    same = rng.random(e) < 0.7
    partners = [np.nonzero(lab == c)[0] for c in range(k)]
    dst_same = np.array([rng.choice(partners[lab[s]]) for s in src])
    dst = np.where(same, dst_same, rng.choice(n, size=e, p=pop))
    both = np.concatenate([np.stack([src, dst]), np.stack([dst, src])],
                          axis=1)
    loop = np.arange(n)
    ei = np.concatenate([both, np.stack([loop, loop])], axis=1)
    key = ei[1] * n + ei[0]
    _, keep = np.unique(key, return_index=True)
    ei = ei[:, keep]
    perm, inv = reorder_for_slabs(ei, n, slab_rows=256, iters=30)
    s2, d2 = inv[ei[0]], inv[ei[1]]
    order = np.argsort(d2, kind="stable")
    s2, d2 = s2[order], d2[order]
    deg = np.bincount(d2, minlength=n).astype(np.float64)
    w2 = (1 / np.sqrt(deg[d2] * deg[s2])).astype(np.float32)
    plan = build_slabs(s2, d2, w2, n, stream_sel="f32", hub_rows=64,
                       min_pair=2, **PARAMS)
    x = np.random.default_rng(3).standard_normal((n, 32)).astype(np.float32)
    return s2, d2, w2, n, plan, x


def test_hub_plan_pins_hub_chunks(hub_problem):
    s2, d2, w2, n, plan, x = hub_problem
    side = plan.fwd
    assert side.hub_rows == 64 and side.hub_ids is not None
    assert side.hub_ids.shape == (64,)
    # chunks addressing the scratch tail actually exist
    hub_sub_base = PARAMS["slab_rows"] // PARAMS["block_rows"]
    assert int(jnp.max(side.subblock)) >= hub_sub_base


def test_hub_requires_ssel():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 100, 500)
    d = rng.integers(0, 100, 500)
    w = np.ones(500, dtype=np.float32)
    with pytest.raises(ValueError, match="hub_rows"):
        build_slabs(s, d, w, 100, hub_rows=64, **PARAMS)


def test_hub_fwd_exact_f32(hub_problem):
    s2, d2, w2, n, plan, x = hub_problem
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_hub_grad_exact_f32(hub_problem):
    s2, d2, w2, n, plan, x = hub_problem
    co = np.random.default_rng(5).standard_normal((n, 32)).astype(np.float32)

    def f_slab(xx):
        return jnp.sum(slab_spmm(xx, plan, compute_dtype=jnp.float32,
                                 interpret=True) * co)

    def f_ref(xx):
        return jnp.sum(spmm(xx, jnp.asarray(s2), jnp.asarray(d2),
                            jnp.asarray(w2), n) * co)

    g1 = np.asarray(jax.grad(f_slab)(jnp.asarray(x)))
    g2 = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(g1, g2, rtol=2e-6, atol=2e-6)


def test_hub_sep_bf16_close(hub_problem):
    s2, d2, w2, n, _, x = hub_problem
    deg = np.bincount(d2, minlength=n).astype(np.float64)
    with np.errstate(divide="ignore"):
        rs = (1.0 / np.sqrt(deg)).astype(np.float32)
    rs[~np.isfinite(rs)] = 0.0
    plan = build_slabs(s2, d2, w2, n, stream_sel="bf16", sep_rs=rs,
                       hub_rows=64, min_pair=2, **PARAMS)
    assert plan.pre_scale is not None
    assert plan.fwd.hub_ids is not None
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.bfloat16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_slab_streamed_remote_matches(problem, monkeypatch):
    """A slab plan whose REMOTE side restacks for scan streaming (huge
    cross-slab edge counts) stays exact vs the oracle, fwd and grad."""
    import sgformer_tpu.kernels.chunks as chunks_mod

    s2, d2, w2, n, _, x = problem
    monkeypatch.setattr(chunks_mod, "STREAM_MAX_CHUNKS", 2)
    plan = build_slabs(s2, d2, w2, n, **PARAMS)
    rem = plan.fwd.remote
    assert rem is not None and rem.stream_shape is not None
    assert rem.stream_shape[0] > 1  # actually streams
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    g = np.random.default_rng(3).standard_normal((n, 32)).astype(np.float32)
    want_dx = np.asarray(jax.grad(lambda x: (spmm(
        x, jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2), n)
        * jnp.asarray(g)).sum())(jnp.asarray(x)))
    got_dx = np.asarray(jax.grad(lambda x: (slab_spmm(
        x, plan, compute_dtype=jnp.float32, interpret=True)
        * jnp.asarray(g)).sum())(jnp.asarray(x)))
    np.testing.assert_allclose(got_dx, want_dx, rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# int8 slab mode (opt-in): per-pass absmax quantization, int8 MXU dots
# ---------------------------------------------------------------------------


def _sep_plan(problem, slab_dtype="int8", **extra):
    s2, d2, w2, n, _, _ = problem
    from sgformer_tpu.graph import gcn_norm_rs

    rs = gcn_norm_rs(d2, n)
    return build_slabs(
        s2, d2, w2, n, stream_sel="bf16", sep_rs=rs,
        slab_dtype=slab_dtype, **PARAMS, **extra,
    )


def test_slab_int8_requires_sep(problem):
    s2, d2, w2, n, _, _ = problem
    with pytest.raises(ValueError, match="sep_rs"):
        build_slabs(s2, d2, w2, n, slab_dtype="int8", **PARAMS)


def test_slab_int8_fwd_exact_on_integer_features():
    """With unit edge weights (rs = 1) and integer features whose absmax is
    planted at 127, the quantization is the identity and the int8 path is
    EXACT integer arithmetic end to end."""
    rng = np.random.default_rng(3)
    n, e = 500, 2600
    s = rng.integers(0, n, e)
    d = rng.integers(0, n, e)
    order = np.argsort(d, kind="stable")
    s, d = s[order], d[order]
    w = np.ones(e, dtype=np.float32)
    plan = build_slabs(
        s, d, w, n, stream_sel="bf16", sep_rs=np.ones(n, np.float32),
        slab_dtype="int8", **PARAMS,
    )
    x = rng.integers(-3, 4, (n, 32)).astype(np.float32)
    x[0, 0] = 127.0  # plants absmax -> scale exactly 1
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(d),
                           jnp.asarray(w), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.bfloat16, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_slab_int8_fwd_and_grad_close(problem):
    """Gaussian features: the int8 path matches the f32 oracle within the
    per-pass quantization tolerance, forward AND gradient (the transpose
    side quantizes the cotangent)."""
    s2, d2, w2, n, _, x = problem
    plan = _sep_plan(problem)
    xj = jnp.asarray(x)
    want = np.asarray(spmm(xj, jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(xj, plan, compute_dtype=jnp.bfloat16,
                               interpret=True))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-2

    g = jnp.asarray(
        np.random.default_rng(5).standard_normal(want.shape).astype(np.float32)
    )

    def loss(xx, p):
        return jnp.vdot(
            slab_spmm(xx, p, compute_dtype=jnp.bfloat16,
                      interpret=True).astype(jnp.float32), g)

    def loss_ref(xx):
        return jnp.vdot(
            spmm(xx, jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2),
                 n).astype(jnp.float32), g)

    gx = np.asarray(jax.grad(loss)(xj, plan))
    gx_ref = np.asarray(jax.grad(loss_ref)(xj))
    gscale = np.abs(gx_ref).max()
    assert np.abs(gx - gx_ref).max() / gscale < 2e-2


def test_slab_int8_under_jit(problem):
    s2, d2, w2, n, _, x = problem
    plan = _sep_plan(problem)
    xj = jnp.asarray(x)

    @jax.jit
    def f(z, p):
        return slab_spmm(z, p, compute_dtype=jnp.bfloat16, interpret=True)

    got = np.asarray(f(xj, plan))
    want = np.asarray(spmm(xj, jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-2


# ---------------------------------------------------------------------------
# Auto hub mode (hub_rows=-1 / 'auto')
# ---------------------------------------------------------------------------


def _auto_hub_edges(n_pad, n_remote, rng, hub_pool=50):
    """Edges whose windows' mass is range-local plus ``n_remote`` edges
    sourced from a small hub pool in the first residency range."""
    dst = rng.integers(0, n_pad, 300_000)
    src = (dst // 16384) * 16384 + rng.integers(0, 16384, len(dst))
    hubs = rng.choice(4096, hub_pool, replace=False)
    rdst = rng.integers(0, n_pad, n_remote)
    rsrc = hubs[rng.integers(0, hub_pool, n_remote)]
    return (np.concatenate([src, rsrc]).astype(np.int64),
            np.concatenate([dst, rdst]).astype(np.int64))


def test_auto_hub_decision():
    """_auto_hub enables the measured hub geometry only for large graphs
    whose remote slots concentrate on few sources (BENCH.md thresholds;
    at real bench scale the top-6144 coverage measured 0.181 uniform vs
    0.412 power-law)."""
    from sgformer_tpu.kernels.slabs import _auto_hub

    rng = np.random.default_rng(0)
    n_pad = 65536
    # hub-concentrated remote traffic -> tail on, slab shrunk to 16K
    src, dst = _auto_hub_edges(n_pad, 80_000, rng)
    hub, R = _auto_hub(src, dst, n_pad, 128, 4096, 24576)
    assert (hub, R) == (6144, 16384)
    # remote share below the gate -> off, R untouched
    src, dst = _auto_hub_edges(n_pad, 8_000, rng)
    hub, R = _auto_hub(src, dst, n_pad, 128, 4096, 24576)
    assert (hub, R) == (0, 24576)
    # graphs smaller than the measured regime -> off
    src, dst = _auto_hub_edges(4096, 80_000, rng)
    hub, R = _auto_hub(src % 4096, dst % 4096, 4096, 128, 4096, 24576)
    assert (hub, R) == (0, 24576)


def test_auto_hub_build_slabs():
    """hub_rows=-1 flows through build_slabs: the triggered plan pins the
    tail and shrinks the slab; meta (non-ssel) mode stays hub-free."""
    rng = np.random.default_rng(1)
    src, dst = _auto_hub_edges(65536, 80_000, rng)
    w = np.ones(len(src), dtype=np.float32)
    plan = build_slabs(src, dst, w, 65536, stream_sel="bf16", hub_rows=-1,
                       slab_rows=24576, base_rows=4096)
    assert plan.fwd.hub_rows == 6144
    assert plan.fwd.slab_rows == 16384
    # f32 stream (8K-slab VMEM cap) and meta mode keep the tail off
    plan = build_slabs(src, dst, w, 65536, stream_sel="f32", hub_rows=-1,
                       slab_rows=8192, base_rows=4096)
    assert plan.fwd.hub_rows == 0
    plan = build_slabs(src, dst, w, 65536, hub_rows="auto",
                       slab_rows=24576, base_rows=4096)
    assert plan.fwd.hub_rows == 0


def test_slab_int8_with_hub_tail(hub_problem):
    """int8 slab mode combined with the hub-resident tail: hub rows are
    gathered from the QUANTIZED features and live in the int8 scratch
    tail; planted-integer features make the whole path exact."""
    s2, d2, w2, n, _, _ = hub_problem
    w = np.ones(len(s2), dtype=np.float32)
    plan = build_slabs(
        s2, d2, w, n, stream_sel="bf16", sep_rs=np.ones(n, np.float32),
        slab_dtype="int8", hub_rows=64, min_pair=2, **PARAMS,
    )
    # the power-law graph must actually produce hub chunks
    assert plan.fwd.hub_ids is not None
    assert int(jnp.max(plan.fwd.subblock)) >= (
        plan.fwd.slab_rows // PARAMS["block_rows"]
    )
    rng = np.random.default_rng(7)
    x = rng.integers(-3, 4, (n, 32)).astype(np.float32)
    x[0, 0] = 127.0  # plants absmax -> scale exactly 1
    want = np.asarray(spmm(jnp.asarray(x), jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w), n))
    got = np.asarray(slab_spmm(jnp.asarray(x), plan,
                               compute_dtype=jnp.bfloat16, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_slab_int8_feature_dim_padding(problem):
    """F not a multiple of 128 pads internally (round 4: 'auto'-selected
    int8 must work at any hidden size) — zero columns aggregate to zero
    and are sliced off, so fwd+grad match the unpadded-oracle results."""
    s2, d2, w2, n, _, x = problem
    plan = _sep_plan(problem)
    x77 = jnp.asarray(np.asarray(x)[:, :77])
    want = np.asarray(spmm(x77, jnp.asarray(s2), jnp.asarray(d2),
                           jnp.asarray(w2), n))
    got = np.asarray(slab_spmm(x77, plan, compute_dtype=jnp.bfloat16,
                               interpret=True))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-2

    g = jnp.asarray(np.random.default_rng(6)
                    .standard_normal(want.shape).astype(np.float32))
    gx = np.asarray(jax.grad(lambda xx: jnp.vdot(
        slab_spmm(xx, plan, compute_dtype=jnp.bfloat16,
                  interpret=True).astype(jnp.float32), g))(x77))
    gx_ref = np.asarray(jax.grad(lambda xx: jnp.vdot(
        spmm(xx, jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2),
             n).astype(jnp.float32), g))(x77))
    assert gx.shape == gx_ref.shape
    assert np.abs(gx - gx_ref).max() / np.abs(gx_ref).max() < 2e-2


def test_auto_slab_dtype_policy_small_graph_stays_bf16():
    """preprocess_graph's slab_dtype='auto' leaves graphs around the
    residency height on the compute-dtype slab (quantize overhead with
    nothing to buy back — BENCH.md 'int8 slab mode')."""
    from sgformer_tpu.graph import preprocess_graph

    rng = np.random.default_rng(0)
    n, e = 3000, 15000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = preprocess_graph(ei, n, with_chunks=True, spmm_mode="ssel",
                         chunk_dtype="bf16", chunk_interpret=True)
    assert g.chunks.slab_dtype == "compute"


def test_auto_slab_dtype_explicit_override():
    """slab_geometry={'slab_dtype': 'int8'} bypasses the auto policy."""
    from sgformer_tpu.graph import preprocess_graph

    rng = np.random.default_rng(0)
    n, e = 3000, 15000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = preprocess_graph(ei, n, with_chunks=True, spmm_mode="ssel",
                         chunk_dtype="bf16", chunk_interpret=True,
                         slab_geometry={"slab_dtype": "int8"})
    assert g.chunks.slab_dtype == "int8"


def test_selector_budget_falls_back_to_meta():
    """When the prebuilt ssel selector streams exceed the HBM budget
    (power-law local fill at 1M+ nodes, round-5), preprocess falls back
    to the meta-mode kernel (in-kernel selector build) instead of dying —
    and the aggregation output is unchanged."""
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph

    ds = synthetic_dataset(num_nodes=300, num_edges=2400, num_features=16,
                           num_classes=4, seed=9)
    g_ssel = preprocess_graph(
        ds.graph["edge_index"], ds.num_nodes, with_chunks=True,
        spmm_mode="ssel", slab_rows=128, chunk_dtype="f32",
        chunk_interpret=True,
    )
    assert g_ssel.chunks.fwd.sel_src is not None
    g_fb = preprocess_graph(
        ds.graph["edge_index"], ds.num_nodes, with_chunks=True,
        spmm_mode="ssel", slab_rows=128, chunk_dtype="f32",
        chunk_interpret=True,
        slab_geometry={"sel_budget_bytes": 1024},  # force the fallback
    )
    assert g_fb.chunks.fwd.sel_src is None
    assert g_fb.chunks.fwd.meta is not None
    x = np.random.default_rng(0).standard_normal(
        (ds.num_nodes, 16)).astype(np.float32)
    a = np.asarray(g_ssel.propagate(jnp.asarray(x[g_ssel.node_perm])))
    b = np.asarray(g_fb.propagate(jnp.asarray(x[g_fb.node_perm])))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
