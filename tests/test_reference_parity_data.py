"""Cross-implementation parity for the data layer: split generators,
quantile labels, and the file-based dataset loaders (twitch-e, fb100)
executing the reference's own ``large/dataset.py`` / ``large/data_utils.py``
on the SAME synthetic raw files our loaders read.

The reference files use removed numpy aliases (``np.int``,
``large/dataset.py:160,207`` — SURVEY.md §8), so the loader tests restore
the alias for the duration of the call.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_shim import REFERENCE_ROOT, install_shims, load_reference  # noqa: E402

if not REFERENCE_ROOT.exists():  # pragma: no cover
    pytest.skip("no reference checkout", allow_module_level=True)

from sgformer_tpu.data import splits as S  # noqa: E402
from sgformer_tpu.data.loaders import load_fb100, load_twitch  # noqa: E402


@pytest.fixture(scope="module")
def ref_du():
    return load_reference("large/data_utils.py", "ref_du_data")


@pytest.fixture(scope="module")
def ref_dataset():
    """large/dataset.py needs its sibling ``data_utils`` plus stubs for the
    PyG dataset classes / transforms / ogb it imports at module level but
    never touches in the file-based loaders."""
    install_shims()
    load_reference("large/data_utils.py", "data_utils")
    stubs = {}

    def stub_module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("stubbed: not available offline")

    tg = sys.modules["torch_geometric"]
    stub_module("torch_geometric.transforms", NormalizeFeatures=_Unavailable)
    tg.transforms = stubs["torch_geometric.transforms"]
    stub_module(
        "torch_geometric.datasets",
        Planetoid=_Unavailable, Amazon=_Unavailable, Coauthor=_Unavailable,
    )
    stub_module("ogb")
    stub_module(
        "ogb.nodeproppred",
        NodePropPredDataset=_Unavailable, PygNodePropPredDataset=_Unavailable,
    )
    stubs["ogb"].nodeproppred = stubs["ogb.nodeproppred"]
    installed = []
    for name, mod in stubs.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            installed.append(name)
    try:
        yield load_reference("large/dataset.py", "ref_dataset")
    finally:
        for name in installed:
            sys.modules.pop(name, None)
        sys.modules.pop("data_utils", None)


class _np_int_alias:
    """Temporarily restore the removed ``np.int`` alias the reference uses
    (``large/dataset.py:160,207``)."""

    def __enter__(self):
        self.had = hasattr(np, "int")
        if not self.had:
            np.int = int  # noqa: NPY001
        return self

    def __exit__(self, *exc):
        if not self.had:
            del np.int


def test_rand_train_test_idx_exact_parity(ref_du):
    """The reference permutes with numpy's GLOBAL legacy RNG
    (``data_utils.py:24``) — seeding it identically, our generator-passing
    version must produce the same split (our function accepts any object
    with ``.permutation``, including the legacy module)."""
    rng = np.random.default_rng(0)
    label = rng.integers(-1, 4, 200)
    np.random.seed(123)
    t_train, t_valid, t_test = ref_du.rand_train_test_idx(
        torch.tensor(label), train_prop=0.5, valid_prop=0.25
    )
    np.random.seed(123)
    ours = S.rand_train_test_idx(
        label, train_prop=0.5, valid_prop=0.25, rng=np.random
    )
    np.testing.assert_array_equal(ours["train"], t_train.numpy())
    np.testing.assert_array_equal(ours["valid"], t_valid.numpy())
    np.testing.assert_array_equal(ours["test"], t_test.numpy())


def test_class_rand_splits_property_parity(ref_du):
    """torch vs numpy RNG can't match bit-for-bit; assert the protocol
    properties coincide (per-class train counts, sizes, disjointness)."""
    rng = np.random.default_rng(1)
    label = rng.integers(0, 5, 400)
    t_train, t_valid, t_test = ref_du.class_rand_splits(
        torch.tensor(label[:, None]), label_num_per_class=20,
        valid_num=50, test_num=100,
    )
    ours = S.class_rand_splits(
        label, 20, valid_num=50, test_num=100, rng=rng
    )
    assert len(ours["train"]) == len(t_train)
    assert len(ours["valid"]) == len(t_valid) == 50
    assert len(ours["test"]) == len(t_test) == 100
    for c in range(5):
        assert (label[ours["train"]] == c).sum() == (
            label[t_train.numpy()] == c
        ).sum() == 20
    all_ours = np.concatenate([ours["train"], ours["valid"], ours["test"]])
    assert len(np.unique(all_ours)) == len(all_ours)


def test_even_quantile_labels_exact(ref_du):
    rng = np.random.default_rng(2)
    vals = rng.integers(1960, 2020, 500).astype(np.float64)
    with _np_int_alias():  # data_utils.py:87 uses the removed np.int
        want = ref_du.even_quantile_labels(vals, 5, verbose=False)
    got = S.even_quantile_labels(vals, 5)
    np.testing.assert_array_equal(got, want)


def _write_twitch(tmp_path, n=20, lang="DE"):
    root = tmp_path / "twitch" / lang
    root.mkdir(parents=True)
    with open(root / f"musae_{lang}_target.csv", "w") as f:
        f.write("id,days,mature,views,partner,new_id\n")
        for i in range(n):
            f.write(f"{i},10,{'True' if i % 2 else 'False'},5,False,{i}\n")
    with open(root / f"musae_{lang}_edges.csv", "w") as f:
        f.write("from,to\n")
        for i in range(n - 1):
            f.write(f"{i},{i + 1}\n")
    import json

    feats = {str(i): [i % 7, (3 * i) % 11] for i in range(n)}
    with open(root / f"musae_{lang}_features.json", "w") as f:
        json.dump(feats, f)


def test_twitch_loader_parity(ref_dataset, tmp_path):
    """``load_twitch_dataset`` uses ``csv``/``json`` that large/dataset.py
    never imports (latent reference bug, SURVEY.md §8) — inject them to
    execute it."""
    import csv as _csv
    import json as _json

    ref_dataset.csv = _csv
    ref_dataset.json = _json
    _write_twitch(tmp_path)
    with _np_int_alias():
        want = ref_dataset.load_twitch_dataset(str(tmp_path) + "/", "DE")
    got = load_twitch(str(tmp_path), "DE")
    np.testing.assert_array_equal(
        np.sort(np.asarray(got.graph["edge_index"]).T, axis=0),
        np.sort(want.graph["edge_index"].numpy().T, axis=0),
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]), want.graph["node_feat"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def _write_fb100(tmp_path, rng):
    import scipy.io as sio

    root = tmp_path / "facebook100"
    root.mkdir(parents=True)
    for school in ("Penn94", "Amherst41", "Cornell5", "Johns Hopkins55",
                   "Reed98"):
        n = int(rng.integers(12, 20))
        a = (rng.random((n, n)) < 0.2).astype(np.float64)
        a = np.triu(a, 1)
        a = a + a.T
        meta = np.zeros((n, 7), dtype=np.float64)
        meta[:, 0] = rng.integers(0, 2, n)  # binary column → sklearn
        meta[:, 1] = rng.integers(0, 3, n)  # gender           special case
        meta[:, 2:] = rng.integers(0, 4, (n, 5))
        sio.savemat(str(root / f"{school}.mat"), {"A": a, "local_info": meta})


def test_fb100_loader_parity(ref_dataset, tmp_path):
    """Includes a BINARY feature column: sklearn ``label_binarize`` with two
    classes emits ONE 0/1 column, which our loader replicates."""
    _write_fb100(tmp_path, np.random.default_rng(4))
    with _np_int_alias():
        want = ref_dataset.load_fb100_dataset(str(tmp_path) + "/", "Penn94")
    got = load_fb100(str(tmp_path), "Penn94")
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]), want.graph["edge_index"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]), want.graph["node_feat"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def test_deezer_loader_parity(ref_dataset, tmp_path):
    import scipy.io as sio
    import scipy.sparse as sp

    from sgformer_tpu.data.loaders import load_dataset

    rng = np.random.default_rng(6)
    n = 18
    a = (rng.random((n, n)) < 0.25).astype(np.float64)
    np.fill_diagonal(a, 0)
    (tmp_path / "deezer").mkdir()
    sio.savemat(
        str(tmp_path / "deezer" / "deezer-europe.mat"),
        {
            "A": sp.csr_matrix(a),
            "label": rng.integers(0, 2, (1, n)),
            "features": sp.csr_matrix(
                (rng.random((n, 8)) < 0.4).astype(np.float64)
            ),
        },
    )
    want = ref_dataset.load_deezer_dataset(str(tmp_path) + "/")
    got = load_dataset(str(tmp_path), "deezer-europe")
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]), want.graph["edge_index"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]), want.graph["node_feat"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def test_yelpchi_loader_parity(ref_dataset, tmp_path):
    import scipy.io as sio
    import scipy.sparse as sp

    from sgformer_tpu.data.loaders import load_dataset

    rng = np.random.default_rng(7)
    n = 16
    a = (rng.random((n, n)) < 0.3).astype(np.float64)
    np.fill_diagonal(a, 0)
    sio.savemat(
        str(tmp_path / "YelpChi.mat"),
        {
            "homo": sp.csr_matrix(a),
            "features": sp.csr_matrix(rng.random((n, 5))),
            "label": rng.integers(0, 2, (1, n)),
        },
    )
    with _np_int_alias():
        want = ref_dataset.load_yelpchi_dataset(str(tmp_path) + "/")
    got = load_dataset(str(tmp_path), "yelp-chi")
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]), want.graph["edge_index"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]), want.graph["node_feat"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def test_snap_patents_loader_parity(ref_dataset, tmp_path):
    import scipy.io as sio
    import scipy.sparse as sp

    from sgformer_tpu.data.loaders import load_dataset

    rng = np.random.default_rng(8)
    n = 25
    sio.savemat(
        str(tmp_path / "snap_patents.mat"),
        {
            "edge_index": rng.integers(0, n, (2, 60)),
            "node_feat": sp.csr_matrix(rng.random((n, 6))),
            "num_nodes": n,
            "years": rng.integers(1970, 2006, (1, n)),
        },
    )
    with _np_int_alias():  # even_quantile_labels uses np.int
        want = ref_dataset.load_snap_patents_mat(str(tmp_path) + "/", nclass=5)
    got = load_dataset(str(tmp_path), "snap-patents")
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]), want.graph["edge_index"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]), want.graph["node_feat"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def test_pokec_loader_parity(ref_dataset, tmp_path):
    import scipy.io as sio

    from sgformer_tpu.data.loaders import load_dataset

    rng = np.random.default_rng(9)
    n = 20
    (tmp_path / "pokec").mkdir()
    sio.savemat(
        str(tmp_path / "pokec" / "pokec.mat"),
        {
            "edge_index": rng.integers(0, n, (2, 50)),
            "node_feat": rng.random((n, 4)),
            "label": rng.integers(0, 2, (1, n)),
        },
    )
    want = ref_dataset.load_pokec_mat(str(tmp_path) + "/")
    got = load_dataset(str(tmp_path), "pokec")
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]), want.graph["edge_index"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]), want.graph["node_feat"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


# ---------------------------------------------------------------------------
# medium/dataset.py loaders (film txt, wiki-filtered npz, heterophilous npz)
# ---------------------------------------------------------------------------


@pytest.fixture()
def ref_medium_dataset(tmp_path, monkeypatch):
    """Load medium/dataset.py with its sibling data_utils, PyG stubs, and
    DATAPATH pointed into tmp_path; the heterophilous loader hardcodes
    '../../heterophilous-graphs/data' so the cwd moves two levels deep."""
    install_shims()
    load_reference("medium/data_utils.py", "data_utils")
    stubs = {}

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("stubbed: not available offline")

    tg = sys.modules["torch_geometric"]
    tmod = sys.modules.get("torch_geometric.transforms")
    if tmod is None:
        tmod = types.ModuleType("torch_geometric.transforms")
        sys.modules["torch_geometric.transforms"] = tmod
        stubs["torch_geometric.transforms"] = tmod
    # extend whatever stub is installed (the large fixture's is narrower)
    for attr in ("NormalizeFeatures", "ToUndirected"):
        if not hasattr(tmod, attr):
            setattr(tmod, attr, _Unavailable)
    tg.transforms = tmod
    dmod = sys.modules.get("torch_geometric.datasets")
    if dmod is None:
        dmod = types.ModuleType("torch_geometric.datasets")
        sys.modules["torch_geometric.datasets"] = dmod
        stubs["torch_geometric.datasets"] = dmod
    if not hasattr(dmod, "Planetoid"):
        dmod.Planetoid = _Unavailable
    try:
        mod = load_reference("medium/dataset.py", "ref_medium_dataset")
        mod.DATAPATH = str(tmp_path / "data") + "/"
        workdir = tmp_path / "run" / "cwd"
        workdir.mkdir(parents=True)
        monkeypatch.chdir(workdir)
        yield mod, tmp_path
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
        sys.modules.pop("data_utils", None)


def test_film_loader_parity(ref_medium_dataset):
    from sgformer_tpu.data.loaders import load_dataset

    mod, tmp_path = ref_medium_dataset
    rng = np.random.default_rng(11)
    n = 14
    root = tmp_path / "data" / "geom-gcn" / "film"
    root.mkdir(parents=True)
    with open(root / "out1_node_feature_label.txt", "w") as f:
        f.write("id\tfeat\tlabel\n")
        for i in range(n):
            fs = sorted(set(rng.integers(0, 932, 3).tolist()))
            f.write(f"{i}\t{','.join(map(str, fs))}\t{int(rng.integers(0, 5))}\n")
    edges = [(i, (i + 1) % n) for i in range(n)] + [(0, 5), (3, 9)]
    with open(root / "out1_graph_edges.txt", "w") as f:
        f.write("src\tdst\n")
        for a, b in edges:
            f.write(f"{a}\t{b}\n")

    want = mod.load_geom_gcn_dataset("film")
    got = load_dataset(str(tmp_path / "data"), "film")
    # edge SETS (the reference's adj+eye coo ordering differs)
    want_set = set(zip(*want.graph["edge_index"].numpy().tolist()))
    got_set = set(zip(*np.asarray(got.graph["edge_index"]).tolist()))
    assert want_set == got_set
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]),
        want.graph["node_feat"].numpy(), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def test_wiki_filtered_loader_parity(ref_medium_dataset):
    from sgformer_tpu.data.loaders import load_dataset

    mod, tmp_path = ref_medium_dataset
    rng = np.random.default_rng(12)
    n = 16
    root = tmp_path / "data" / "wiki_new" / "chameleon"
    root.mkdir(parents=True)
    np.savez(
        root / "chameleon_filtered.npz",
        node_features=rng.random((n, 5)).astype(np.float32),
        node_labels=rng.integers(0, 4, n),
        edges=np.stack(
            [rng.integers(0, n, 40), rng.integers(0, n, 40)], axis=1
        ),
    )
    want = mod.load_wiki_new("chameleon")
    got = load_dataset(str(tmp_path / "data"), "chameleon")
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]), want.graph["edge_index"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]),
        want.graph["node_feat"].numpy(), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )


def test_heterophilous_loader_parity(ref_medium_dataset):
    from sgformer_tpu.data.loaders import load_dataset

    mod, tmp_path = ref_medium_dataset
    rng = np.random.default_rng(13)
    n, runs = 18, 3
    # the reference reads ../../heterophilous-graphs/data relative to cwd
    # (tmp_path/run/cwd), i.e. tmp_path/heterophilous-graphs/data
    ref_root = tmp_path / "heterophilous-graphs" / "data"
    ref_root.mkdir(parents=True)
    payload = dict(
        node_features=rng.random((n, 6)).astype(np.float32),
        node_labels=rng.integers(0, 3, n),
        edges=np.stack(
            [rng.integers(0, n, 50), rng.integers(0, n, 50)], axis=1
        ),
        train_masks=rng.random((runs, n)) < 0.5,
        val_masks=rng.random((runs, n)) < 0.25,
        test_masks=rng.random((runs, n)) < 0.25,
    )
    np.savez(ref_root / "roman_empire.npz", **payload)
    ours_root = tmp_path / "data" / "heterophilous"
    ours_root.mkdir(parents=True)
    np.savez(ours_root / "roman_empire.npz", **payload)

    want = mod.load_heterophily_dataset("roman-empire")
    got = load_dataset(str(tmp_path / "data"), "roman-empire")
    # reference quirk (SURVEY.md §8): it stores the RAW [E, 2] edges array
    # as 'edge_index' (medium/dataset.py:300-304); ours uses the [2, E]
    # convention every other loader follows
    np.testing.assert_array_equal(
        np.asarray(got.graph["edge_index"]),
        want.graph["edge_index"].numpy().T,
    )
    np.testing.assert_allclose(
        np.asarray(got.graph["node_feat"]),
        want.graph["node_feat"].numpy(), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.label).reshape(-1), want.label.numpy().reshape(-1)
    )
    # the 10-mask rotation: same split per index
    for i in range(runs):
        ref_split = want.load_fixed_splits()[i % runs] if callable(
            getattr(want, "load_fixed_splits", None)
        ) else None
        ours_split = got.load_fixed_splits(i)
        np.testing.assert_array_equal(
            ours_split["train"], np.where(payload["train_masks"][i])[0]
        )
