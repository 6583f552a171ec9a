"""Native (C++/ctypes) kernels: availability, parity with the numpy paths,
and speed sanity on the chunk builder."""

import numpy as np
import pytest

from sgformer_tpu.native import native_available
from sgformer_tpu.native.api import (
    fill_chunk_plan_native,
    sample_neighbors_native,
)
from sgformer_tpu.sample.neighbor import CSRGraph


def test_native_compiles():
    assert native_available(), "g++ toolchain should be present in this image"


def test_chunk_plan_native_matches_python():
    from sgformer_tpu.kernels import chunks as ch

    rng = np.random.default_rng(0)
    n, e = 500, 4000
    src = rng.integers(0, n, e).astype(np.int64)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    C, W = 128, 64
    n_windows = -(-n // W)
    indptr = np.zeros(n_windows * W + 1, dtype=np.int64)
    np.cumsum(np.bincount(dst, minlength=n_windows * W), out=indptr[1:])

    native = fill_chunk_plan_native(indptr, src, dst, w, n_windows * W, W, C)
    assert native is not None
    g, ld, wt, wid = native

    # python reference (the loop body of _build_plan)
    g2, ld2, wt2, wid2 = [], [], [], []
    for win in range(n_windows):
        lo, hi = win * W, min((win + 1) * W, n_windows * W)
        e0, e1 = int(indptr[lo]), int(indptr[hi])
        k = max(1, -(-(e1 - e0) // C))
        for c in range(k):
            a = e0 + c * C
            b = min(e0 + (c + 1) * C, e1)
            gg = np.zeros(C, np.int32); dd = np.zeros(C, np.int32)
            ww = np.zeros(C, np.float32)
            gg[: b - a] = src[a:b]
            dd[: b - a] = dst[a:b] - win * W
            ww[: b - a] = w[a:b]
            g2.append(gg); ld2.append(dd); wt2.append(ww); wid2.append(win)
    np.testing.assert_array_equal(g, np.stack(g2))
    np.testing.assert_array_equal(ld, np.stack(ld2))
    np.testing.assert_array_equal(wt, np.stack(wt2))
    np.testing.assert_array_equal(wid, np.asarray(wid2, np.int32))


def test_sample_neighbors_native_validity():
    rng = np.random.default_rng(1)
    n, e = 200, 3000
    edge_index = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    csr = CSRGraph.from_edge_index(edge_index, n)
    frontier = rng.permutation(n)[:50].astype(np.int64)
    res = sample_neighbors_native(csr.indptr, csr.indices, frontier, 5, seed=7)
    assert res is not None
    src, dst = res
    # every sampled edge must exist; per-node counts <= min(deg, fanout)
    from collections import Counter

    cnt = Counter(dst.tolist())
    for v in frontier:
        deg = int(csr.indptr[v + 1] - csr.indptr[v])
        assert cnt[int(v)] <= min(deg, 5) if deg > 5 else cnt[int(v)] == deg
    for s, d in zip(src[:200], dst[:200]):
        nbrs = csr.indices[csr.indptr[d]: csr.indptr[d + 1]]
        assert s in nbrs


def test_lpa_cluster_native_recovers_planted_partition():
    """csrc::lpa_cluster matches the numpy label_propagation oracle's
    quality on a planted partition (different RNG stream — assignments
    differ, recovery must not)."""
    import numpy as np
    import pytest

    from sgformer_tpu.native.api import lpa_cluster_native

    rng = np.random.default_rng(0)
    n, k, e = 2000, 5, 20000
    lab = rng.integers(0, k, n)
    src = rng.integers(0, n, e)
    same = rng.random(e) < 0.9
    partners = [np.nonzero(lab == c)[0] for c in range(k)]
    dst = np.where(
        same,
        np.array([rng.choice(partners[lab[s]]) for s in src]),
        rng.integers(0, n, e),
    )
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    labels = lpa_cluster_native(s2, d2, n, 40, n + 1, 0)
    if labels is None:
        pytest.skip("native library unavailable")
    assert labels.shape == (n,)
    # every recovered cluster is (near-)pure in the planted labels
    purity = sum(
        np.bincount(lab[labels == u]).max() for u in np.unique(labels)
    ) / n
    assert purity > 0.95
    # deterministic per seed
    again = lpa_cluster_native(s2, d2, n, 40, n + 1, 0)
    np.testing.assert_array_equal(labels, again)


def test_cluster_pack_native_matches_python():
    """csrc ``cluster_pack`` vs the python heapq oracle — bit-identical
    perms (same heap order, same boundary splits) across cluster-count
    regimes including single-cluster and all-singleton."""
    from sgformer_tpu.kernels.slabs import cluster_pack_perm

    rng = np.random.default_rng(0)
    for n, k, rows in [(1000, 50, 128), (10000, 700, 512),
                       (5000, 5000, 256), (777, 3, 100), (64, 1, 64)]:
        c = rng.integers(0, k, n)
        a = cluster_pack_perm(c, rows, use_native=True)
        b = cluster_pack_perm(c, rows, use_native=False)
        assert np.array_equal(a, b), (n, k, rows)
        assert np.array_equal(np.sort(a), np.arange(n))


def test_fill_chunks_sorted_matches_lexsort_path():
    """csrc ``fill_chunks_sorted`` (in-kernel per-window src sort) vs the
    host ``lexsort((src, dst // W))`` + plain fill — bit-identical plans
    (the stable in-window sort keeps equal-src ties in dst order)."""
    from sgformer_tpu.native.api import (
        fill_chunk_plan_native,
        fill_chunk_plan_sorted_native,
    )

    rng = np.random.default_rng(1)
    for E, n, W, C in [(5000, 900, 128, 64), (100000, 8192, 512, 512),
                       (300, 50, 16, 8)]:
        src = rng.integers(0, n, E)
        dst = np.sort(rng.integers(0, n, E))
        w = rng.random(E).astype(np.float32)
        nw = -(-n // W)
        indptr = np.zeros(nw * W + 1, np.int64)
        np.cumsum(np.bincount(dst, minlength=nw * W), out=indptr[1:])
        order = np.lexsort((src, dst // W))
        a = fill_chunk_plan_native(indptr, src[order], dst[order], w[order],
                                   nw * W, W, C)
        b = fill_chunk_plan_sorted_native(indptr, src, dst, w, nw * W, W, C)
        assert a is not None and b is not None
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_fallback_plan_handles_global_src_ids(monkeypatch):
    """Regression (round-4 review): the no-native-lib fallback sort keyed
    windows by ``(dst//W)*num_nodes + src``, which collides across windows
    whenever src ids exceed ``num_nodes`` — exactly the rectangular fwd
    plans ``parallel/partition.py::_shard_chunk_plans`` builds (GLOBAL
    source ids, per-shard output rows).  The key's src stride must exceed
    max(src)."""
    from sgformer_tpu.kernels import chunks as ch
    from sgformer_tpu.native import api

    monkeypatch.setattr(api, "fill_chunk_plan_native", lambda *a, **k: None)
    monkeypatch.setattr(
        api, "fill_chunk_plan_sorted_native", lambda *a, **k: None
    )

    rng = np.random.default_rng(2)
    block, total, e, C, W = 64, 256, 400, 32, 16
    src = rng.integers(0, total, e).astype(np.int64)  # GLOBAL ids > block
    dst = np.sort(rng.integers(0, block, e)).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    plan = ch._build_plan(src, dst, w, block, C, W)

    # densify the plan: every slot scatters weight * x[gather] into its
    # window row; must equal the plain segment-sum oracle
    x = rng.random((total, 3)).astype(np.float32)
    g = np.asarray(plan.gather_idx)
    ld = np.asarray(plan.local_dst)
    wt = np.asarray(plan.weight)
    wid = np.asarray(plan.window_id)
    out = np.zeros((plan.num_rows_out, 3), np.float32)
    for c in range(plan.num_chunks):
        rows = wid[c] * W + ld[c]
        assert (ld[c] >= 0).all() and (ld[c] < W).all()
        np.add.at(out, rows, wt[c][:, None] * x[g[c]])
    oracle = np.zeros_like(out)
    np.add.at(oracle, dst, w[:, None] * x[src])
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)
