"""Chunked out-of-core graph prep (data/prep.py) vs the in-RAM oracle.

The oracle is the same pipeline the full-graph path uses
(``to_undirected`` → ``remove_self_loops`` → ``add_self_loops`` →
``CSRGraph.from_edge_index``), which itself is parity-tested against the
reference's preprocessing (``large/main.py:74-79``,
``100M/nb-sample.py:79-80``)."""

from __future__ import annotations

import numpy as np
import pytest

from sgformer_tpu.data.prep import (
    build_undirected_csr,
    csr_to_edge_index,
    load_csr,
)
from sgformer_tpu.graph import add_self_loops, remove_self_loops, to_undirected
from sgformer_tpu.sample.neighbor import CSRGraph


def _oracle_csr(edge_index, n, add_loops=True):
    e = to_undirected(edge_index)
    if add_loops:
        e = add_self_loops(remove_self_loops(e), n)
    return CSRGraph.from_edge_index(e, n)


@pytest.mark.parametrize("seed,n,e", [(0, 57, 300), (1, 200, 1500), (2, 33, 40)])
@pytest.mark.parametrize("chunk,buckets", [(64, 4), (10_000, 1), (17, 7)])
def test_build_matches_oracle(tmp_path, seed, n, e, chunk, buckets):
    rng = np.random.default_rng(seed)
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(
        np.int64
    )
    # plant self-loops and duplicates — both must coalesce identically
    edges[:, : e // 10] = np.stack([np.arange(e // 10) % n] * 2)
    edges[:, e // 10 : e // 5] = edges[:, : e // 10 - e // 20 or 1].repeat(
        2, axis=1
    )[:, : e // 5 - e // 10]
    out = build_undirected_csr(
        edges, n, str(tmp_path / f"csr_{seed}_{chunk}_{buckets}"),
        chunk_edges=chunk, num_buckets=buckets,
    )
    got = load_csr(out)
    want = _oracle_csr(edges, n)
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)


def test_build_no_loops(tmp_path):
    rng = np.random.default_rng(3)
    n, e = 80, 400
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(
        np.int64
    )
    out = build_undirected_csr(
        edges, n, str(tmp_path / "csr_nl"), chunk_edges=100, num_buckets=3,
        add_loops=False,
    )
    got = load_csr(out)
    want = CSRGraph.from_edge_index(to_undirected(edges), n)
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)


def test_npy_input_and_memmap_load(tmp_path):
    rng = np.random.default_rng(4)
    n, e = 50, 220
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(
        np.int64
    )
    path = str(tmp_path / "edges.npy")
    np.save(path, edges)
    out = build_undirected_csr(path, n, str(tmp_path / "csr_f"),
                               chunk_edges=37, num_buckets=2)
    a = load_csr(out, in_ram=True)
    b = load_csr(out, in_ram=False)
    np.testing.assert_array_equal(a.indices, np.asarray(b.indices))
    want = _oracle_csr(edges, n)
    np.testing.assert_array_equal(a.indptr, want.indptr)
    np.testing.assert_array_equal(a.indices, want.indices)


def test_csr_to_edge_index_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    n, e = 40, 160
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(
        np.int64
    )
    out = build_undirected_csr(edges, n, str(tmp_path / "csr_r"),
                               num_buckets=3)
    csr = load_csr(out)
    ei = csr_to_edge_index(csr)
    want = _oracle_csr(edges, n)
    back = CSRGraph.from_edge_index(ei, n)
    np.testing.assert_array_equal(back.indptr, want.indptr)
    np.testing.assert_array_equal(back.indices, want.indices)


def test_isolated_nodes_get_self_loops(tmp_path):
    # nodes 10..19 have no edges at all — they must still appear with
    # exactly their self-loop (the reference's add_self_loops covers all
    # nodes, large/main.py:79)
    edges = np.array([[0, 1, 2], [1, 2, 3]], dtype=np.int64)
    n = 20
    out = build_undirected_csr(edges, n, str(tmp_path / "csr_i"),
                               num_buckets=4)
    csr = load_csr(out)
    deg = np.diff(csr.indptr)
    assert (deg[10:] == 1).all()
    for i in range(10, 20):
        assert csr.indices[csr.indptr[i]] == i


@pytest.mark.parametrize("n,buckets", [(100, 16), (17, 7), (5, 16)])
def test_bucket_ranges_beyond_num_nodes(tmp_path, n, buckets):
    """Bucket ranges past num_nodes (small n, many buckets) must emit
    nothing instead of crashing np.bincount with a negative minlength
    (round-5 review finding)."""
    rng = np.random.default_rng(n)
    edges = np.stack([rng.integers(0, n, 40), rng.integers(0, n, 40)]).astype(
        np.int64
    )
    out = build_undirected_csr(
        edges, n, str(tmp_path / f"csr_small_{n}"), num_buckets=buckets
    )
    got = load_csr(out)
    want = _oracle_csr(edges, n)
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
