"""Pair-count statistics for the dense-block (BSR-style) slab redesign.

CPU only: builds the clustering reorder on the bench graph and reports,
for candidate (W, B) block geometries, how many (window, sub-block) pairs
exist at each min_pair threshold, the implied S-matrix storage, MXU flops
per SpMM pass, and the residual remote-edge fraction.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")

from sgformer_tpu.data.loaders import synthetic_dataset
from sgformer_tpu.graph import (add_self_loops, remove_self_loops,
                                to_undirected)
from sgformer_tpu.kernels.slabs import reorder_for_slabs


def main():
    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    ei = to_undirected(np.asarray(ds.graph["edge_index"]))
    ei = add_self_loops(remove_self_loops(ei), N)
    src, dst = ei
    t0 = time.time()
    perm, inv = reorder_for_slabs(np.stack([src, dst]), N, slab_rows=16384)
    print(f"reorder: {time.time()-t0:.1f}s")
    src, dst = inv[src], inv[dst]
    m = src != dst
    src, dst = src[m], dst[m]
    E = len(src)
    print(f"non-self edges: {E}")

    for W, B, R in [(128, 128, 16384), (256, 256, 16384),
                    (128, 256, 16384), (256, 128, 16384),
                    (512, 512, 16384), (128, 128, 24576),
                    (256, 256, 24576)]:
        H = 4096
        n_pad = -(-N // H) * H
        n_windows = -(-n_pad // W)
        win = dst // W
        # per-window resident base via sliding histogram (same as slabs.py)
        n_bins = n_pad // H
        span = R // H
        hist = np.zeros((n_windows, n_bins), dtype=np.int32)
        np.add.at(hist, (win, src // H), 1)
        sliding = np.cumsum(hist, axis=1)
        pad = np.zeros((n_windows, 1), dtype=sliding.dtype)
        sliding = np.concatenate([pad, sliding], axis=1)
        cover = sliding[:, span:] - sliding[:, :-span]
        base = np.argmax(cover, axis=1).astype(np.int64)
        best = cover[np.arange(n_windows), base]
        for w in range(1, n_windows):
            pb = base[w - 1]
            if cover[w, pb] >= 0.98 * best[w]:
                base[w] = pb
        slab_changes = int(np.sum(base[1:] != base[:-1])) + 1

        ebase = base[win]
        local = (src // H >= ebase) & (src // H < ebase + span)
        ls, ld = src[local], dst[local]
        lwin = ld // W
        lsub = (ls - base[lwin] * H) // B
        key = lwin * (R // B) + lsub
        uniq, cnt = np.unique(key, return_counts=True)
        print(f"\nW={W} B={B} R={R}: local frac {local.mean():.3f}, "
              f"pairs={len(uniq)}, slab_changes={slab_changes}, "
              f"windows={n_windows}, slab_mb={R*256*2/2**20:.0f}")
        F = 256
        for C in [32, 64, 128, 256]:
            for mp in [8, 16, 32]:
                keep = cnt >= mp
                e_loc = int(cnt[keep].sum())
                chunks = int(np.ceil(cnt[keep] / C).sum())
                slots = chunks * C
                fill = e_loc / slots if slots else 0.0
                flops = slots * F * (B + W) * 2 / 1e9
                rem = E - e_loc
                t_loc = flops / (197e12 * 0.5) * 1e3  # 50% MXU
                t_rem = rem / 0.85 * 7.4e-9 * 1e3  # 85% remote fill
                print(f"  C={C:3d} mp={mp:2d}: local={e_loc/E:.3f} "
                      f"fill={fill:.2f} chunks={chunks:6d} "
                      f"flops={flops:6.1f}G -> local {t_loc:5.2f} ms "
                      f"+ remote {t_rem:5.2f} ms = {t_loc+t_rem:5.2f}")


if __name__ == "__main__":
    main()


def hub_coverage():
    """Remote-edge source skew: how much would a resident hub table cover?"""
    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    ei = to_undirected(np.asarray(ds.graph["edge_index"]))
    ei = add_self_loops(remove_self_loops(ei), N)
    src, dst = ei
    perm, inv = reorder_for_slabs(np.stack([src, dst]), N, slab_rows=16384)
    src, dst = inv[src], inv[dst]
    m = src != dst
    src, dst = src[m], dst[m]
    W, R, H = 128, 24576, 4096
    n_pad = -(-N // H) * H
    n_windows = -(-n_pad // W)
    win = dst // W
    n_bins = n_pad // H
    span = R // H
    hist = np.zeros((n_windows, n_bins), dtype=np.int32)
    np.add.at(hist, (win, src // H), 1)
    sliding = np.cumsum(hist, axis=1)
    pad = np.zeros((n_windows, 1), dtype=sliding.dtype)
    sliding = np.concatenate([pad, sliding], axis=1)
    cover = sliding[:, span:] - sliding[:, :-span]
    base = np.argmax(cover, axis=1).astype(np.int64)
    best = cover[np.arange(n_windows), base]
    for w in range(1, n_windows):
        pb = base[w - 1]
        if cover[w, pb] >= 0.98 * best[w]:
            base[w] = pb
    ebase = base[win]
    local = (src // H >= ebase) & (src // H < ebase + span)
    rs, rd = src[~local], dst[~local]
    print(f"remote edges: {len(rs)} ({(~local).mean():.3f})")
    cnt = np.bincount(rs, minlength=n_pad)
    order = np.argsort(cnt)[::-1]
    csum = np.cumsum(cnt[order])
    for K in (512, 1024, 2048, 4096, 8192):
        print(f"  top-{K:5d} hub rows cover {csum[K-1]/len(rs):.3f} "
              f"of remote edges")
    # fill if hub chunks only need window alignment (C=64)
    for K in (1024, 2048):
        hubset = np.zeros(n_pad, dtype=bool)
        hubset[order[:K]] = True
        hm = hubset[rs]
        hw = rd[hm] // W
        cntw = np.bincount(hw, minlength=n_windows)
        for C in (32, 64):
            chunks = int(np.ceil(cntw / C).sum())
            e = int(cntw.sum())
            print(f"  K={K} C={C}: hub edges {e} fill {e/max(chunks*C,1):.2f}"
                  f" chunks {chunks}")


if __name__ == "__main__" and __import__("sys").argv[-1] == "hub":
    hub_coverage()
