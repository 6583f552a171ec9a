"""Host-side analysis: (window, sub-block) local-group size histogram on
the bench graph — sizing the two-tier (tall+short chunk) local kernel idea.

Current ssel geometry: C=16, Q=128 -> every 16-edge chunk is one
[16, B]x[B, F] MXU dot (11 ns issue each, scripts/microbench_slab_geom.py
cost model).  Groups are CONTIGUOUS runs of one (window, sub) pair, so a
group of size >= k*128 could issue k [128, B]x[B, F] dots instead of 8k
short ones.  This script reports how many dots/slots each tiering saves.
CPU-only; no TPU needed.
"""

import numpy as np

from sgformer_tpu.data.loaders import synthetic_dataset
from sgformer_tpu.graph import preprocess_graph


def main():
    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                         spmm_mode="ssel")
    side = g.chunks.fwd
    W, B, C, Q = (side.window_rows, side.block_rows, side.chunk_edges,
                  side.chunks_per_step)
    R = side.slab_rows
    print(f"geometry W={W} B={B} C={C} Q={Q} R={R} steps={side.n_steps}")

    # reconstruct group sizes from the selector stream: sel_dst[step] is
    # [W, Q*C] 0/1; a slot is live iff its column has a 1.  sub-block id per
    # chunk comes from side.subblock [steps, 1, Q].
    sd = np.asarray(side.sel_dst)          # int8 [S, W, Q*C]
    live = sd.any(axis=1).reshape(-1, Q, C)  # [S, Q, C]
    chunk_fill = live.sum(axis=2)            # [S, Q]
    sub = np.asarray(side.subblock)[:, 0, :]  # [S, Q]
    win = np.asarray(side.window_id)          # [S]

    S = len(win)
    total_slots = live.size
    live_slots = int(chunk_fill.sum())
    n_chunks = int((chunk_fill > 0).sum())
    print(f"local edges (live slots): {live_slots}   chunks: {n_chunks}   "
          f"fill: {live_slots / max(n_chunks * C, 1):.3f}   "
          f"padded fill (incl. empty chunks): {live_slots / total_slots:.3f}")

    # group = contiguous (window, sub) run; chunks of one group are adjacent
    # in (step, q) order within a window's steps
    key = win[:, None] * (R // B + side.hub_rows // B + 2) + sub
    key = np.where(chunk_fill > 0, key, -1).reshape(-1)
    fills = chunk_fill.reshape(-1)
    m = key >= 0
    key, fills = key[m], fills[m]
    # contiguous runs of equal key
    new = np.r_[True, key[1:] != key[:-1]]
    gid = np.cumsum(new) - 1
    gsize = np.bincount(gid, weights=fills).astype(np.int64)
    print(f"groups: {len(gsize)}  mean size {gsize.mean():.1f}  "
          f"median {np.median(gsize):.0f}")

    for thresh in (32, 64, 96, 128, 256):
        share = gsize[gsize >= thresh].sum() / gsize.sum()
        print(f"  edges in groups >= {thresh:3d}: {share*100:5.1f}%")

    # two-tier simulation: groups emit floor(size/Ct) tall chunks of C=Ct
    # plus ceil(rem/16) short chunks.
    for Ct in (64, 128, 256):
        tall = gsize // Ct
        rem = gsize - tall * Ct
        short = -(-rem // C)
        tall_edges = int((tall * Ct).sum())
        dots_now = n_chunks
        # issue model: 11 ns/short dot; tall dot of height Ct costs
        # ~max(11, Ct/16 * 2.7) ns (MXU rows finally busy)
        t_now = dots_now * 11
        t_tall = int(tall.sum()) * max(11, Ct / 16 * 2.7) + int(short.sum()) * 11
        print(f"tier C_tall={Ct:3d}: tall dots {int(tall.sum()):7d} "
              f"({tall_edges/gsize.sum()*100:4.1f}% of edges) + short "
              f"{int(short.sum()):7d}  issue-model {t_now/1e6:.2f} -> "
              f"{t_tall/1e6:.2f} ms/pass")


if __name__ == "__main__":
    main()


def cost_model():
    """Simulate t_local = 0.55us/step + 11ns/dot + 0.54ns/slot over the
    REAL group-size histogram for candidate chunk heights C."""
    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=128,
                           num_classes=40, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                         spmm_mode="ssel")
    side = g.chunks.fwd
    W, B, C, Q = (side.window_rows, side.block_rows, side.chunk_edges,
                  side.chunks_per_step)
    R = side.slab_rows
    sd = np.asarray(side.sel_dst)
    live = sd.any(axis=1).reshape(-1, Q, C)
    chunk_fill = live.sum(axis=2)
    sub = np.asarray(side.subblock)[:, 0, :]
    win = np.asarray(side.window_id)
    key = win[:, None] * (R // B + 2) + sub
    key = np.where(chunk_fill > 0, key, -1).reshape(-1)
    fills = chunk_fill.reshape(-1)
    m = key >= 0
    key, fills = key[m], fills[m]
    new = np.r_[True, key[1:] != key[:-1]]
    gid = np.cumsum(new) - 1
    gsize = np.bincount(gid, weights=fills).astype(np.int64)
    gwin = np.bincount(gid, weights=(key // (R // B + 2)))  # win*count
    gcount = np.bincount(gid)
    gwin = (gwin / gcount).astype(np.int64)  # window of each group
    qs = np.percentile(gsize, [1, 5, 10, 25, 50, 75, 90, 95, 99])
    print("group size percentiles:", dict(zip([1,5,10,25,50,75,90,95,99],
                                              qs.round(1))))
    print(f"QC budget = {Q*C}")
    for Cc in (16, 24, 32, 40, 48, 56, 64, 96):
        dots_per_group = -(-gsize // Cc)
        dots = int(dots_per_group.sum())
        slots = dots * Cc
        # steps: chunks per window / Q' where Q' = QC_budget // Cc
        Qc = (Q * C) // Cc
        win_dots = np.bincount(gwin, weights=dots_per_group)
        steps = int(np.ceil(win_dots / Qc).sum())
        t = steps * 0.55e-6 + dots * 11e-9 + slots * (B + W) * 0.0042e-9 * \
            (1 + 0)  # 0.54ns/slot at B+W=256 bytes -> per byte 0.0021
        t_ns = steps * 550 + dots * 11 + slots * 0.54
        print(f"C={Cc:3d}: dots {dots:7d} slots {slots:8d} "
              f"fill {gsize.sum()/slots:.3f} steps {steps:5d} "
              f"model {t_ns/1e6:.2f} ms/pass")
