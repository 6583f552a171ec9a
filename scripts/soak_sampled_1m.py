"""1M-node neighbor-sampled soak: the papers100M execution recipe at the
largest scale this host comfortably holds.

Exercises the full 100M-tier stack end to end (``100M/nb-sample.py``
semantics): memmap FeatureStore (features never materialize in RAM),
C++ CSR fanout sampler (csrc::sample_batch), fixed-shape padded batches,
PrefetchIterator overlap, seed-node loss masking, eval sweep.

Run alone (ONE TPU process): PYTHONPATH=/root/repo:/root/.axon_site.
"""

import os
import tempfile
import time

import numpy as np


def main():
    import jax

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from sgformer_tpu.data.feature_store import FeatureStore
    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.sampled_trainer import (SampledTrainConfig,
                                                    SampledTrainer)

    N, E, F = 1_000_000, 8_000_000, 128
    t0 = time.time()
    ds = synthetic_dataset(num_nodes=N, num_edges=E, num_features=F,
                           num_classes=40, seed=0, powerlaw=1.1)
    print(f"synth: {time.time()-t0:.0f}s", flush=True)

    # features on disk, memmap-gathered per batch (the papers100M layout)
    tmp = tempfile.mkdtemp(prefix="feat1m_")
    path = os.path.join(tmp, "feat.bin")
    store = FeatureStore.create(path, ds.graph["node_feat"].astype(np.float32))
    print(f"feature store: {store.shape} memmap at {path}", flush=True)

    cfg = SGFormerConfig.papers100m(256, 40, compute_dtype="bf16")
    tc = SampledTrainConfig(
        lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0,
        epochs=1, eval_step=1, batch_size=1000, fanouts=(15, 10, 5),
        display_step=-1,
    )
    trainer = SampledTrainer(SGFormer(cfg), ds.graph["edge_index"], store,
                             ds.label, tc)
    # trim the splits so the soak is minutes, not hours: 200 train batches,
    # 50 eval batches per split (fixed-shape batches make this exact)
    split = ds.get_idx_split(rng=np.random.default_rng(0))
    split = {
        "train": np.asarray(split["train"])[: 200 * tc.batch_size],
        "valid": np.asarray(split["valid"])[: 25_000],
        "test": np.asarray(split["test"])[: 25_000],
    }
    t0 = time.time()
    logger = trainer.fit([split])
    total = time.time() - t0
    print(f"fit: {total:.0f}s total incl. compiles "
          f"(200 train batches + 3x eval sweeps)", flush=True)
    s = logger.run_summary(0)
    print(f"final_test={s['final_test']:.3f}", flush=True)

    # steady-state sampling rate alone
    t0 = time.time()
    k = 20
    it = iter(trainer.sampler.epoch(split["train"]))
    for _ in range(k):
        next(it)
    print(f"host sampling: {(time.time()-t0)/k*1e3:.0f} ms/batch "
          f"(fanout {tc.fanouts}, batch {tc.batch_size}, 1M-node CSR)",
          flush=True)


if __name__ == "__main__":
    main()
