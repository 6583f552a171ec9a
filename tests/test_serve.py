"""Serving path: AOT-compiled Predictor, checkpoint round-trip, reorder
mapping, and agreement with the trainer's eval step."""

import numpy as np
import pytest

import jax

from sgformer_tpu.data.loaders import synthetic_dataset
from sgformer_tpu.graph import preprocess_graph
from sgformer_tpu.nn import SGFormer, SGFormerConfig
from sgformer_tpu.serve import Predictor, load_predictor
from sgformer_tpu.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def trained():
    ds = synthetic_dataset(num_nodes=300, num_edges=2400, num_features=16,
                           num_classes=4, seed=3)
    graph = preprocess_graph(ds.graph["edge_index"], ds.num_nodes)
    cfg = SGFormerConfig(16, 4, gnn="graphconv", trans_dropout=0.0,
                         gnn_dropout=0.0)
    model = SGFormer(cfg)
    tc = TrainConfig(lr=0.01, epochs=5, eval_step=5, display_step=-1)
    trainer = Trainer(model, graph, ds.graph["node_feat"], ds.label, tc)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    trainer.fit([split])
    return ds, graph, model, trainer


def test_predictor_matches_eval_step(trained):
    ds, graph, model, trainer = trained
    pred = Predictor(model, graph, ds.graph["node_feat"],
                     trainer.final_state).compile()
    got = pred.logits()
    want = np.asarray(trainer._eval_step(trainer.final_state))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.dtype == np.float32 and got.shape == (300, 4)


def test_predictor_handles_slab_reorder(trained):
    """Slab-mode graphs permute nodes; logits must come back in the
    caller's original node order."""
    ds, _, model, trainer = trained
    g_slab = preprocess_graph(
        ds.graph["edge_index"], ds.num_nodes, with_chunks=True,
        spmm_mode="slab", slab_rows=128, chunk_dtype="f32",
        chunk_interpret=True,
    )
    assert g_slab.node_perm is not None
    pred = Predictor(model, g_slab, ds.graph["node_feat"],
                     trainer.final_state)
    got = pred.logits()
    want = np.asarray(trainer._eval_step(trainer.final_state))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_predict_and_proba(trained):
    ds, graph, model, trainer = trained
    pred = Predictor(model, graph, ds.graph["node_feat"],
                     trainer.final_state)
    idx = np.array([5, 17, 250])
    cls = pred.predict(idx)
    proba = pred.predict_proba(idx)
    assert cls.shape == (3,) and proba.shape == (3, 4)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)
    assert (proba.argmax(axis=1) == cls).all()


def test_load_predictor_checkpoint_roundtrip(trained, tmp_path):
    ds, graph, model, trainer = trained
    from sgformer_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(str(tmp_path / "ck"), trainer.final_state, step=5)
    pred = load_predictor(str(tmp_path / "ck"), model, graph,
                          ds.graph["node_feat"])
    want = np.asarray(trainer._eval_step(trainer.final_state))
    np.testing.assert_allclose(pred.logits(), want, rtol=1e-5, atol=1e-5)


def test_compiled_predictor_never_retraces(trained):
    """AOT-compiled predictors serve from the executable, not the jit
    cache: tracing after compile() would be a serving-latency bug."""
    ds, graph, model, trainer = trained
    pred = Predictor(model, graph, ds.graph["node_feat"],
                     trainer.final_state).compile()
    with jax.checking_leaks():
        out1 = pred.logits()
        out2 = pred.logits()
    np.testing.assert_allclose(out1, out2)


def test_export_artifact_roundtrip(trained, tmp_path):
    """jax.export hand-off: the serialized artifact reproduces the
    predictor's logits when called with the same pytrees — the
    model-code-free deployment path (serve.py round-4 addition)."""
    from sgformer_tpu.serve import load_exported

    ds, graph, model, trainer = trained
    state = trainer.final_state
    p = Predictor(model, graph, ds.graph["node_feat"], state)
    want = p.logits()
    path = str(tmp_path / "sgformer.jaxexport")
    p.export_artifact(path, include_inputs=True)
    exp = load_exported(path)
    # call with the flat leaves restored FROM THE BUNDLE — proving the
    # serving side needs no package types at all
    import numpy as _np

    bundle = _np.load(path + ".inputs.npz")
    leaves = [bundle[k]
              for k in sorted((f for f in bundle.files if f.startswith("arr_")),
                              key=lambda s: int(s.split("_")[1]))]
    got = np.asarray(exp.call(*leaves))
    # the bundle is self-contained: its own inv_perm maps the exported
    # forward's (possibly slab-reordered) rows back to original node ids
    got = got[bundle["inv_perm"]]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
