"""Host-side scale probe: out-of-core prep + sampler throughput at
arbitrary node/edge counts WITHOUT features or training.

The papers100M budget (docs/PAPERS100M.md) extrapolates prep time/RAM
and sampler depth cost linearly from the 10M soak; this probe measures
those two anchors directly at larger scales (e.g. 50M nodes / 750M
directed edges — HALF of papers100M's node count) so the extrapolation
is bracketed by measurements, not a single point.

  PYTHONPATH=/root/repo python scripts/host_scale_probe.py \
      --nodes 50000000 --edges 750000000 [--dir /tmp/sgformer_probe]

CPU-only (no TPU needed).  Prints: edge-gen time, prep (symmetrize+
dedup+loops -> CSR) time + RAM high-water, CSR size, CSR load time, and
C++ sampler ms/batch at fanout [15,10,5] / batch 1000.
"""

import argparse
import os
import resource
import shutil
import time

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=50_000_000)
    p.add_argument("--edges", type=int, default=750_000_000)
    p.add_argument("--dir", default="/tmp/sgformer_probe")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--keep", action="store_true",
                   help="keep artifacts (default: delete at exit)")
    args = p.parse_args()
    N, E = args.nodes, args.edges
    os.makedirs(args.dir, exist_ok=True)

    edges_p = os.path.join(args.dir, f"edges_{N}_{E}.npy")
    if not os.path.exists(edges_p):
        t0 = time.time()
        rng = np.random.default_rng(0)
        pop = (np.arange(1, N + 1, dtype=np.float64) + 10.0) ** -1.1
        pop = rng.permutation(pop / pop.sum())
        emm = np.lib.format.open_memmap(
            edges_p + ".part", mode="w+", dtype=np.int64, shape=(2, E))
        for lo in range(0, E, 25_000_000):
            hi = min(lo + 25_000_000, E)
            emm[0, lo:hi] = rng.choice(N, hi - lo, p=pop)
            emm[1, lo:hi] = rng.integers(0, N, hi - lo)
            print(f"[probe] edges {hi}/{E} rss={rss_gb():.1f}GB", flush=True)
        emm.flush()
        del emm
        os.rename(edges_p + ".part", edges_p)
        print(f"[probe] edge gen: {time.time()-t0:.0f}s", flush=True)

    from sgformer_tpu.data.prep import build_undirected_csr, load_csr

    csr_dir = os.path.join(args.dir, f"csr_{N}_{E}")
    if not os.path.exists(os.path.join(csr_dir, "csr_meta.json")):
        t0 = time.time()
        build_undirected_csr(edges_p, N, csr_dir,
                             chunk_edges=25_000_000,
                             num_buckets=args.buckets, progress=True)
        print(f"[probe] PREP (symmetrize+dedup+loops -> CSR): "
              f"{time.time()-t0:.0f}s  rss high-water {rss_gb():.1f}GB",
              flush=True)
    t0 = time.time()
    csr = load_csr(csr_dir, in_ram=True)
    print(f"[probe] CSR load: {time.time()-t0:.0f}s  "
          f"{len(csr.indices):,} edges ({csr.indices.nbytes/2**30:.1f} GB "
          f"indices)  rss={rss_gb():.1f}GB", flush=True)

    from sgformer_tpu.sample.neighbor import NeighborSampler

    sampler = NeighborSampler(csr, N, fanouts=(15, 10, 5), batch_size=1000,
                              seed=0)
    seeds = np.random.default_rng(1).integers(0, N, 32_000)
    # warm
    sampler.sample(seeds[:1000])
    K = 20
    t0 = time.time()
    for i in range(K):
        sampler.sample(seeds[i * 1000:(i + 1) * 1000])
    print(f"[probe] sampler: {(time.time()-t0)/K*1e3:.0f} ms/batch "
          f"(fanout [15,10,5], batch 1000, {N:,}-node CSR)  "
          f"truncated nodes/edges: {sampler.truncated_node_batches}/"
          f"{sampler.truncated_edge_batches}", flush=True)
    print(f"[probe] final rss high-water {rss_gb():.1f}GB", flush=True)
    if not args.keep:
        os.unlink(edges_p)
        shutil.rmtree(csr_dir)


if __name__ == "__main__":
    main()
