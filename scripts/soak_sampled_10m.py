"""10M-node neighbor-sampled soak — the papers100M recipe exercised at
10x the round-2 scale, from DISK (round-4 VERDICT task 1).

Two phases:

  python scripts/soak_sampled_10m.py --build   # host-only: dataset to disk
  PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/soak_sampled_10m.py           # TPU: train/eval from disk

--build writes a 10M-node / 150M-directed-edge power-law synthetic under
DATA_DIR (default /tmp/sgformer_10m): features as a [10M, 128] f32 .npy
memmap (written CHUNKED — never fully in RAM), labels + splits as .npy,
directed edges as a [2, 150M] int64 .npy, and the symmetrized+self-looped
in-neighbor CSR via the out-of-core builder
(``sgformer_tpu.data.prep.build_undirected_csr`` — the bounded-RAM
equivalent of the reference's in-RAM ``to_undirected``+``add_self_loops``
at ``100M/nb-sample.py:79-80``).

The run phase loads ONLY: labels (40 MB), the CSR (indices in RAM — the
deliberate residency split), and a ``FeatureStore`` view of the features
(5.1 GB stays on disk; batches gather rows).  It then runs the REAL
``SampledTrainer`` (fanout [15,10,5], batch 1000, bf16, seed-masked loss)
for a trimmed epoch with train-tail + eval sweeps + checkpoint, records
host RAM high-water, CSR build/load time, host sampling ms/batch, and
steady-state train step time, and asserts the streaming-eval counts
against a from-scratch mirror of the reference's ``evaluate`` accumulation
(``nb-sample.py:38-45,176-191``) on the same batches — the at-scale
version of ``tests/test_reference_parity_sampled.py``.

Run alone (ONE TPU process).  Numbers land in BENCH.md + docs/PAPERS100M.md.
"""

import argparse
import json
import os
import resource
import time

import numpy as np

DATA_DIR = os.environ.get("SOAK10M_DIR", "/tmp/sgformer_10m")
N, E_DIR, F, C = 10_000_000, 150_000_000, 128, 64


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build():
    # each phase skips if its output exists, so an interrupted build
    # resumes instead of regenerating 7.5 GB (phases are rng-independent:
    # every phase uses its own seeded Generator)
    os.makedirs(DATA_DIR, exist_ok=True)
    t_all = time.time()

    labels_p = os.path.join(DATA_DIR, "labels.npy")
    if not os.path.exists(labels_p):
        t0 = time.time()
        label = np.random.default_rng(0).integers(0, C, N).astype(np.int32)
        np.save(labels_p, label)
        print(f"[build] labels: {time.time()-t0:.0f}s rss={rss_gb():.1f}GB",
              flush=True)
    label = np.load(labels_p)

    # features: class-conditional gaussians, written chunked into the memmap
    feat_p = os.path.join(DATA_DIR, "feat.npy")
    if not os.path.exists(feat_p):
        t0 = time.time()
        rng = np.random.default_rng(1)
        mm = np.lib.format.open_memmap(
            feat_p + ".part", mode="w+", dtype=np.float32, shape=(N, F),
        )
        centers = (rng.standard_normal((C, F)) * 2.0).astype(np.float32)
        for lo in range(0, N, 1_000_000):
            hi = min(lo + 1_000_000, N)
            mm[lo:hi] = centers[label[lo:hi]] + rng.standard_normal(
                (hi - lo, F)
            ).astype(np.float32)
        mm.flush()
        del mm
        os.rename(feat_p + ".part", feat_p)
        print(f"[build] features: {time.time()-t0:.0f}s "
              f"rss={rss_gb():.1f}GB", flush=True)

    # edges: Zipf(1.1) popularity sources, homophilous destinations —
    # the synthetic_dataset(powerlaw=1.1) recipe, chunked
    edges_p = os.path.join(DATA_DIR, "edges.npy")
    if not os.path.exists(edges_p):
        t0 = time.time()
        rng = np.random.default_rng(2)
        pop = (np.arange(1, N + 1, dtype=np.float64) + 10.0) ** -1.1
        pop = rng.permutation(pop / pop.sum())
        order = np.argsort(label, kind="stable")
        class_starts = np.searchsorted(label[order], np.arange(C))
        class_ends = np.searchsorted(label[order], np.arange(C),
                                     side="right")
        emm = np.lib.format.open_memmap(
            edges_p + ".part", mode="w+", dtype=np.int64, shape=(2, E_DIR),
        )
        for lo in range(0, E_DIR, 15_000_000):
            hi = min(lo + 15_000_000, E_DIR)
            m = hi - lo
            src = rng.choice(N, m, p=pop)
            same = rng.random(m) < 0.8
            ls, le = class_starts[label[src]], class_ends[label[src]]
            dst_same = order[ls + (rng.random(m) * (le - ls)).astype(
                np.int64)]
            dst = np.where(same, dst_same, rng.integers(0, N, m))
            emm[0, lo:hi] = src
            emm[1, lo:hi] = dst
            print(f"[build] edges {hi}/{E_DIR} rss={rss_gb():.1f}GB",
                  flush=True)
        emm.flush()
        del emm
        os.rename(edges_p + ".part", edges_p)
        print(f"[build] edges: {time.time()-t0:.0f}s", flush=True)

    # splits 50/25/25
    if not os.path.exists(os.path.join(DATA_DIR, "train_idx.npy")):
        perm = np.random.default_rng(3).permutation(N)
        np.save(os.path.join(DATA_DIR, "train_idx.npy"), perm[: N // 2])
        np.save(os.path.join(DATA_DIR, "valid_idx.npy"),
                perm[N // 2 : (3 * N) // 4])
        np.save(os.path.join(DATA_DIR, "test_idx.npy"),
                perm[(3 * N) // 4 :])

    # out-of-core symmetrize + self-loops + CSR
    from sgformer_tpu.data.prep import build_undirected_csr

    t0 = time.time()
    build_undirected_csr(
        os.path.join(DATA_DIR, "edges.npy"), N,
        os.path.join(DATA_DIR, "csr"), chunk_edges=20_000_000,
        num_buckets=32, progress=True,
    )
    csr_s = time.time() - t0
    meta = json.load(open(os.path.join(DATA_DIR, "csr", "csr_meta.json")))
    print(f"[build] CSR (symmetrize+loops, out-of-core): {csr_s:.0f}s, "
          f"{meta['num_edges']} edges, rss={rss_gb():.1f}GB", flush=True)
    print(f"[build] TOTAL {time.time()-t_all:.0f}s  "
          f"host RAM high-water {rss_gb():.1f}GB", flush=True)


def run():
    import jax

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    import jax.numpy as jnp

    from sgformer_tpu.data.feature_store import FeatureStore
    from sgformer_tpu.data.prep import load_csr
    from sgformer_tpu.nn import SGFormer, SGFormerConfig
    from sgformer_tpu.train.sampled_trainer import (SampledTrainConfig,
                                                    SampledTrainer,
                                                    batch_graph)

    label = np.load(os.path.join(DATA_DIR, "labels.npy"))
    store = FeatureStore.from_npy(os.path.join(DATA_DIR, "feat.npy"))
    t0 = time.time()
    csr = load_csr(os.path.join(DATA_DIR, "csr"), in_ram=True)
    print(f"CSR load (indices->RAM): {time.time()-t0:.0f}s, "
          f"{len(csr.indices)} edges, rss={rss_gb():.1f}GB", flush=True)

    cfg = SGFormerConfig.papers100m(256, C, compute_dtype="bf16")
    tc = SampledTrainConfig(
        lr=1e-3, trans_weight_decay=0.0, gnn_weight_decay=0.0,
        epochs=1, eval_step=1, batch_size=1000, fanouts=(15, 10, 5),
        display_step=-1, save_model=True,
        model_dir=os.path.join(DATA_DIR, "ckpt"),
    )
    trainer = SampledTrainer(SGFormer(cfg), csr, store, label, tc)

    # trimmed splits; the odd tails force remainder batches through both
    # the train loop (seed-masked loss) and the eval sweeps
    split = {
        "train": np.load(os.path.join(DATA_DIR, "train_idx.npy"))
        [: 300 * tc.batch_size + 517],
        "valid": np.load(os.path.join(DATA_DIR, "valid_idx.npy"))[: 25_250],
        "test": np.load(os.path.join(DATA_DIR, "test_idx.npy"))[: 25_250],
    }
    t0 = time.time()
    logger = trainer.fit([split])
    total = time.time() - t0
    print(f"fit: {total:.0f}s total incl. compiles (301 train batches "
          f"incl. tail + 3x eval sweeps + ckpt)  rss={rss_gb():.1f}GB",
          flush=True)
    s = logger.run_summary(0)
    print(f"final_test={s['final_test']:.3f}", flush=True)
    print(f"sampler truncation: nodes={trainer.sampler.truncated_node_batches} "
          f"edges={trainer.sampler.truncated_edge_batches}", flush=True)
    assert os.path.exists(tc.model_dir), "checkpoint missing"

    # steady-state host sampling rate on the 10M CSR
    t0 = time.time()
    k = 20
    it = iter(trainer.sampler.epoch(split["train"]))
    for _ in range(k):
        next(it)
    samp_ms = (time.time() - t0) / k * 1e3
    print(f"host sampling: {samp_ms:.0f} ms/batch (fanout {tc.fanouts}, "
          f"batch {tc.batch_size}, 10M-node/{len(csr.indices)}-edge CSR)",
          flush=True)

    # steady-state train step: fresh batches through the warm jit, the
    # full prepared pipeline (sampling+gather+bf16 cast in the prefetch
    # thread, bf16 transfer)
    from sgformer_tpu.train.optim import dual_weight_decay_adam

    state = {
        "params": jax.tree.map(jnp.asarray, trainer.best_state["params"]),
        "batch_stats": jax.tree.map(
            jnp.asarray, trainer.best_state["batch_stats"]),
    }
    tx = dual_weight_decay_adam(state["params"], tc.lr, 0.0, 0.0)
    opt_state = tx.init(state["params"])
    train_step, eval_step = trainer._steps(tx)
    rng = jax.random.PRNGKey(7)
    k = 50
    t0 = time.time()
    loss = None
    for batch, x_rows in trainer.prepared_epoch(
        split["train"][: k * tc.batch_size]
    ):
        g = batch_graph(batch)
        rng, drop = jax.random.split(rng)
        state, opt_state, loss = train_step(
            state, opt_state, drop, jnp.asarray(x_rows),
            g, jnp.asarray(trainer.label[batch.node_ids]),
            jnp.asarray(batch.node_mask),
            jnp.asarray(float(batch.num_seeds), jnp.float32),
        )
    _ = float(loss)  # value-fetch sync (relay-safe)
    step_ms = (time.time() - t0) / k * 1e3
    print(f"steady-state train: {step_ms:.0f} ms/batch end-to-end "
          f"({k} batches, sampling+gather+cast prefetched)", flush=True)

    # at-scale eval-count parity: our sweep accumulation vs a from-scratch
    # mirror of the reference's evaluate() counts (nb-sample.py:38-45,
    # 176-191) over the SAME batches — incl. the tail batch
    seeds = split["valid"]
    ours_total = ours_correct = 0
    ref_total = ref_correct = 0
    n_batches = 0
    for batch, x_rows in trainer.prepared_epoch(seeds, shuffle=False):
        g = batch_graph(batch)
        pred = np.asarray(eval_step(
            state, jnp.asarray(x_rows), g,
            jnp.asarray(batch.node_mask)))
        lab = trainer.label[batch.node_ids[: batch.num_seeds]]
        # ours: _sweep's accumulation
        ours_total += batch.num_seeds
        ours_correct += int((pred[: batch.num_seeds] == lab).sum())
        # reference mirror: correct/total over graph.batch_size rows
        out_rows = pred[: batch.num_seeds]
        ref_correct += int((out_rows == lab).sum())
        ref_total += len(lab)
        n_batches += 1
    assert ours_total == len(seeds), (ours_total, len(seeds))
    assert (ours_correct, ours_total) == (ref_correct, ref_total)
    assert n_batches == -(-len(seeds) // tc.batch_size)
    print(f"eval-count parity OK over {n_batches} batches "
          f"({ours_total} nodes incl. {len(seeds)%tc.batch_size}-seed tail); "
          f"valid acc {ours_correct/ours_total:.3f}", flush=True)
    print(f"host RAM high-water: {rss_gb():.1f} GB", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--build", action="store_true")
    args = p.parse_args()
    if args.build:
        build()
    else:
        run()
