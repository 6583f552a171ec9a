"""Arxiv-scale fast-path accuracy soak: f32-exact vs production bf16-ssel.

No real datasets exist in this environment (VERDICT round-1 §missing-1),
so this is the strongest available evidence that the bf16 + slab-ssel +
rbg-dropout fast path does not drift: train the published arxiv model
shape (hidden 256, 1 trans + 3 gnn layers, ``large/run.sh:1-5``) on a
HARD arxiv-shaped synthetic (homophily 0.35 / feature_scale 0.12 — the
round-4 calibration sweep's sub-ceiling operating point, ~75% best-val
test, see the in-code comment at the ``hom, fs`` assignment), 3 runs
each, and compare best-val-selected test accuracy:

  A. f32 + pallas chunk plans  (bit-exact vs the numpy oracle, tested)
  B. bf16 + ssel slab plans    (the bench.py production path)

Run alone (ONE TPU process): PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np


def main():
    import jax

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.data.splits import class_rand_splits
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.trainer import TrainConfig, Trainer

    N, E_dir = 169_343, 1_166_243
    # Synthetic hardness (retuned round 4, VERDICT weak #7): the round-2
    # setting (homophily 0.55, feature_scale 0.15) topped out at 99% —
    # with 40 classes a 0.55-homophilous degree-15 neighborhood is a
    # nearly noiseless majority vote, so drift bounds had no resolution.
    # Calibration sweep (--calibrate, single-run 150-epoch fits on the
    # production path, BENCH.md round 4): accuracy falls off a cliff with
    # hardness — (0.45,0.12)→93.0, (0.40,0.12)→86.1, (0.35,0.12)→74.7,
    # (0.30,0.10)→46.1, (0.25,0.08)→20.9.  homophily 0.35 /
    # feature_scale 0.12 lands best-val test at ~75%, the arxiv-like band
    # (published arxiv 72.63) where a fast-path numerics change has
    # resolution to show.
    hom, fs = 0.35, 0.12

    import sys

    if "--calibrate" in sys.argv:
        # hardness sweep: single run, shorter budget, production path only
        import ast
        cands = [(0.45, 0.12), (0.40, 0.12), (0.35, 0.12), (0.40, 0.10)]
        for arg in sys.argv:
            if arg.startswith("--candidates="):
                cands = ast.literal_eval(arg.split("=", 1)[1])
        for cand_hom, cand_fs in cands:
            cds = synthetic_dataset(num_nodes=N, num_edges=E_dir,
                                    num_features=128, num_classes=40,
                                    seed=0, homophily=cand_hom,
                                    feature_scale=cand_fs)
            csplit = class_rand_splits(
                cds.label.reshape(-1), label_num_per_class=500,
                valid_num=25_000, test_num=50_000,
                rng=np.random.default_rng(42))
            t0 = time.time()
            graph = preprocess_graph(cds.graph["edge_index"], N,
                                     with_chunks=True, spmm_mode="ssel",
                                     chunk_dtype="bf16")
            cfg = SGFormerConfig.large(
                256, 40, trans_num_layers=1, gnn_num_layers=3,
                graph_weight=0.5, compute_dtype="bf16")
            tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0,
                             gnn_weight_decay=0.0, epochs=150,
                             eval_step=10, runs=1, seed=123,
                             display_step=-1)
            trainer = Trainer(SGFormer(cfg), graph,
                              cds.graph["node_feat"], cds.label, tc)
            logger = trainer.fit([csplit])
            s = logger.run_summary(0)
            print(f"hom {cand_hom:.2f} fs {cand_fs:.2f}: "
                  f"test {100*s['final_test']:.2f} "
                  f"val {100*s['highest_valid']:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        return

    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0, homophily=hom,
                           feature_scale=fs)
    split = class_rand_splits(ds.label.reshape(-1), label_num_per_class=500,
                              valid_num=25_000, test_num=50_000,
                              rng=np.random.default_rng(42))

    def run(label, spmm_mode, chunk_dtype, compute_dtype, **geo):
        t0 = time.time()
        graph = preprocess_graph(ds.graph["edge_index"], N,
                                 with_chunks=True, spmm_mode=spmm_mode,
                                 chunk_dtype=chunk_dtype,
                                 slab_rows=geo.pop("slab_rows", 24576),
                                 slab_geometry=geo or None)
        cfg = SGFormerConfig.large(
            256, 40, trans_num_layers=1, gnn_num_layers=3,
            graph_weight=0.5, compute_dtype=compute_dtype,
        )
        tc = TrainConfig(lr=1e-3, trans_weight_decay=0.0,
                         gnn_weight_decay=0.0, epochs=300, eval_step=10,
                         runs=3, seed=123, display_step=-1)
        trainer = Trainer(SGFormer(cfg), graph, ds.graph["node_feat"],
                          ds.label, tc)
        logger = trainer.fit([split])
        sums = [logger.run_summary(r) for r in range(3)]
        test = np.array([s["final_test"] for s in sums])
        val = np.array([s["highest_valid"] for s in sums])
        print(f"{label:32s} test {100*test.mean():.2f}±{100*test.std():.2f} "
              f"val {100*val.mean():.2f} "
              f"({time.time()-t0:.0f}s incl compile)", flush=True)
        return test.mean()

    a = run("A f32 + chunk plans (exact)", "chunks", "f32", "f32")
    b = run("B bf16 + ssel slabs (production)", "ssel", "bf16", "bf16")
    print(f"\nfast-path drift: {100*(b-a):+.2f}pp "
          f"(production minus exact)", flush=True)
    if "--q8" in sys.argv:
        c = run("C int8 slabs R49152 (opt-in)", "ssel", "bf16", "bf16",
                slab_dtype="int8", slab_rows=49152)
        print(f"q8 drift: {100*(c-a):+.2f}pp (int8 minus exact)", flush=True)


if __name__ == "__main__":
    main()
