"""Dataset loader formats: synthetic on-disk fixtures for every raw format
the reference consumes (.mat fb100/pokec-style, musae csv/json twitch,
geom-gcn txt, heterophilous npz, OGB csv.gz, memmap store)."""

import gzip
import json

import numpy as np
import pytest

from sgformer_tpu.data.loaders import (
    load_dataset,
    load_fb100,
    load_geom_gcn,
    load_npz_graph,
    load_twitch,
)


def test_npz_heterophilous_masks(tmp_path):
    n = 30
    rng = np.random.default_rng(0)
    np.savez(
        tmp_path / "roman-empire.npz",
        node_features=rng.standard_normal((n, 5)).astype(np.float32),
        edges=rng.integers(0, n, (60, 2)),
        node_labels=rng.integers(0, 3, n),
        train_masks=rng.random((10, n)) < 0.5,
        val_masks=rng.random((10, n)) < 0.25,
        test_masks=rng.random((10, n)) < 0.25,
    )
    ds = load_dataset(str(tmp_path), "roman-empire")
    assert ds.num_nodes == n
    s0 = ds.load_fixed_splits(0)
    s3 = ds.load_fixed_splits(3)
    assert set(s0) == {"train", "valid", "test"}
    assert not np.array_equal(s0["train"], s3["train"])


def test_fb100_onehot_features(tmp_path):
    import scipy.io as sio
    import scipy.sparse as sp

    root = tmp_path / "facebook100"
    root.mkdir()
    rng = np.random.default_rng(1)
    n = 25
    a = sp.random(n, n, density=0.2, format="csr", random_state=2)
    meta = np.stack([
        rng.integers(1, 4, n),           # col 0: status
        rng.integers(1, 3, n),           # col 1: gender (label)
        rng.integers(1, 5, n),           # col 2+
        rng.integers(1, 6, n),
    ], axis=1)
    sio.savemat(str(root / "Penn94.mat"), {"A": a, "local_info": meta})
    ds = load_fb100(str(tmp_path), "Penn94")
    assert ds.num_nodes == n
    assert set(np.unique(ds.label)) <= {0, 1}
    # one-hot blocks: each row sums to number of encoded columns
    assert np.allclose(ds.graph["node_feat"].sum(1),
                       ds.graph["node_feat"].sum(1).astype(int))


def test_twitch_csv_json(tmp_path):
    root = tmp_path / "twitch" / "DE"
    root.mkdir(parents=True)
    n = 12
    with open(root / "musae_DE_target.csv", "w") as f:
        f.write("id,days,mature,views,partner,new_id\n")
        for i in range(n):
            f.write(f"{i},10,{'True' if i % 2 else 'False'},5,False,{i}\n")
    with open(root / "musae_DE_edges.csv", "w") as f:
        f.write("from,to\n")
        for i in range(n - 1):
            f.write(f"{i},{i + 1}\n")
    feats = {str(i): [i % 7, (i * 3) % 11] for i in range(n)}
    with open(root / "musae_DE_features.json", "w") as f:
        json.dump(feats, f)
    ds = load_twitch(str(tmp_path), "DE")
    assert ds.num_nodes == n
    assert ds.label.reshape(-1).tolist() == [i % 2 for i in range(n)]
    assert ds.graph["node_feat"].sum() > 0


def test_geom_gcn_txt_film(tmp_path):
    root = tmp_path / "geom-gcn" / "film"
    root.mkdir(parents=True)
    n = 8
    with open(root / "out1_node_feature_label.txt", "w") as f:
        f.write("id\tfeat\tlabel\n")
        for i in range(n):
            f.write(f"{i}\t{i},{i + 1}\t{i % 3}\n")
    with open(root / "out1_graph_edges.txt", "w") as f:
        f.write("src\tdst\n")
        for i in range(n - 1):
            f.write(f"{i}\t{i + 1}\n")
    # one fixed-split npz alongside
    rng = np.random.default_rng(0)
    np.savez(root / "film_split_0.6_0.2_0.npz",
             train_mask=rng.random(n) < 0.6,
             val_mask=rng.random(n) < 0.2,
             test_mask=rng.random(n) < 0.2)
    ds = load_geom_gcn(str(tmp_path), "film")
    assert ds.num_nodes == n
    assert ds.graph["node_feat"].shape == (n, 932)
    # features are ROW-NORMALIZED like the reference's preprocess_features
    # (medium/dataset.py:214-224): each row here has two one-hot entries
    assert ds.graph["node_feat"][3, 3] == 0.5 and ds.graph["node_feat"][3, 4] == 0.5
    # the edge list carries the adj+eye self-loops (medium/dataset.py:206)
    src, dst = ds.graph["edge_index"]
    assert ((src == dst).sum()) == n
    assert ds.load_fixed_splits is not None


def test_ogb_csv_gz_roundtrip(tmp_path):
    root = tmp_path / "ogbn_arxiv" / "raw"
    root.mkdir(parents=True)
    rng = np.random.default_rng(3)
    n, e = 20, 50
    edges = rng.integers(0, n, (e, 2))
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    labels = rng.integers(0, 5, (n, 1))

    def wgz(name, arr, fmt):
        with gzip.open(root / name, "wt") as f:
            for row in np.atleast_2d(arr):
                f.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")

    wgz("edge.csv.gz", edges, "%d")
    wgz("node-feat.csv.gz", feats, "%.6f")
    wgz("node-label.csv.gz", labels, "%d")
    ds = load_dataset(str(tmp_path), "ogbn-arxiv")
    assert ds.num_nodes == n
    assert ds.graph["edge_index"].shape == (2, e)
    # cache written; second load hits it
    assert (tmp_path / "ogbn_arxiv" / "processed.npz").exists()
    ds2 = load_dataset(str(tmp_path), "ogbn-arxiv")
    np.testing.assert_array_equal(ds2.graph["node_feat"], ds.graph["node_feat"])


def test_arxiv_year_quantile_labels(tmp_path):
    # reuse the arxiv fixture from the previous test layout
    root = tmp_path / "ogbn_arxiv" / "raw"
    root.mkdir(parents=True)
    rng = np.random.default_rng(4)
    n = 30
    with gzip.open(root / "edge.csv.gz", "wt") as f:
        for _ in range(40):
            f.write(f"{rng.integers(0, n)},{rng.integers(0, n)}\n")
    with gzip.open(root / "node-feat.csv.gz", "wt") as f:
        for _ in range(n):
            f.write("0.1,0.2\n")
    with gzip.open(root / "node-label.csv.gz", "wt") as f:
        for _ in range(n):
            f.write(f"{rng.integers(0, 5)}\n")
    with gzip.open(root / "node_year.csv.gz", "wt") as f:
        for i in range(n):
            f.write(f"{2000 + i % 20}\n")
    ds = load_dataset(str(tmp_path), "arxiv-year")
    assert set(np.unique(ds.label)) <= set(range(5))
