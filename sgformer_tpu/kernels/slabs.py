"""Host-side planning for the slab SpMM kernel (round-2 redesign).

Why: the measured wall for ``A_norm @ X`` on this hardware is the per-edge
source-row HBM gather — ~7.5 ns/row regardless of dtype, row size (128B+)
or index locality (scripts/microbench_gather.py).  The round-1 chunk
kernel still gathers every edge's source row, so the arxiv-shaped train
step is ~93% gather.  The slab design eliminates the gather for edges
whose source lies in the same ``slab`` (contiguous block of ``B_slab``
reordered nodes) as their destination window: the slab is VMEM-resident,
and the "gather" becomes a [C, B] one-hot matmul against a [B, F]
sub-block of the slab — MXU work at ~0.3M flops/edge instead of a 7.5 ns
descriptor.  Cross-slab ("remote") edges keep the round-1 gather+selector
path.  A structural clustering reorder (capacity-capped label
propagation + greedy packing) maximizes the local fraction.

Replaces the same cuSPARSE SpMM call sites as ``kernels/chunks.py``
(``/root/reference/large/ours.py:33-34``, ``100M/ours.py:80``).
"""

from __future__ import annotations

import dataclasses
import sys
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgformer_tpu.kernels.chunks import ChunkPlan, _build_plan


def label_propagation(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    iters: int = 40,
    max_size: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """Capacity-capped label propagation: each node adopts the most common
    label among its neighbors, but labels at/above ``max_size`` members
    stop attracting (prevents collapse past the slab capacity).  Stops
    early once labels are stable.  Returns compacted cluster ids.
    O(iters * E log E) numpy; edges should be the undirected edge list.
    (Convergence is slow from singleton seeds — ~40 sweeps on an
    arxiv-shaped planted partition reaches the homophily ceiling.)"""
    rng = np.random.default_rng(seed)
    labels = np.arange(num_nodes, dtype=np.int64)
    if max_size is None:
        max_size = max(256, num_nodes // 16)
    for _ in range(iters):
        prev = labels.copy()
        l = labels[src]
        order = np.lexsort((l, dst))
        d, ll = dst[order], l[order]
        run = np.empty(len(d), dtype=bool)
        run[0] = True
        run[1:] = (d[1:] != d[:-1]) | (ll[1:] != ll[:-1])
        starts = np.nonzero(run)[0]
        counts = np.diff(np.r_[starts, len(d)])
        gd, gl = d[starts], ll[starts]
        # labels that hit capacity stop attracting new members
        sizes = np.bincount(labels, minlength=num_nodes)
        full = sizes[gl] >= max_size
        key = counts.astype(np.float64) + rng.random(len(counts)) * 0.5
        key[full & (gl != labels[gd])] = -1.0
        o2 = np.lexsort((key, gd))
        gd2, gl2, key2 = gd[o2], gl[o2], key[o2]
        last = np.r_[np.nonzero(gd2[1:] != gd2[:-1])[0], len(gd2) - 1]
        upd_nodes, upd_labels, upd_key = gd2[last], gl2[last], key2[last]
        ok = upd_key > 0
        labels[upd_nodes[ok]] = upd_labels[ok]
        if np.array_equal(labels, prev):
            break
    _, labels = np.unique(labels, return_inverse=True)
    return labels


def cluster_pack_perm(
    clusters: np.ndarray, slab_rows: int, use_native: bool = True
) -> np.ndarray:
    """Boundary-aware best-fit-decreasing packing: fill each slab with the
    largest remaining clusters that fit; when nothing fits, split the
    largest cluster exactly at the boundary (its two pieces stay
    contiguous, so only that cluster's cross-piece edges go remote).
    Slabs are fixed [i*slab_rows, (i+1)*slab_rows) ranges of the new
    order.  Returns ``perm`` with ``perm[new_id] = old_id``.  The C++
    port (csrc ``cluster_pack``) runs the identical algorithm ~50x
    faster; this python loop is the no-toolchain fallback and oracle
    (``tests/test_native.py`` asserts bit-equality)."""
    import heapq

    clusters = np.asarray(clusters)
    if use_native:
        from sgformer_tpu.native.api import cluster_pack_native

        native = cluster_pack_native(clusters, slab_rows)
        if native is not None:
            return native
    sizes = np.bincount(clusters)
    order_in_cluster = np.argsort(clusters, kind="stable")
    starts = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=starts[1:])
    # max-heap of (-size, cluster, consumed-offset)
    heap = [(-int(sizes[c]), int(c), 0) for c in range(len(sizes))
            if sizes[c] > 0]
    heapq.heapify(heap)
    pieces = []
    remaining = slab_rows
    pending = []  # didn't fit this slab's gap; kept in descending size
    while heap or pending:
        while heap:
            neg, c, off = heapq.heappop(heap)
            size = -neg
            if size <= remaining:
                pieces.append(order_in_cluster[starts[c] + off:
                                               starts[c] + off + size])
                remaining -= size
                if remaining == 0:
                    break
            else:
                pending.append((size, c, off))
        if remaining > 0 and pending:
            # nothing fits the gap: split the largest pending cluster
            # exactly at the boundary
            size, c, off = pending.pop(0)
            pieces.append(order_in_cluster[starts[c] + off:
                                           starts[c] + off + remaining])
            pending.append((size - remaining, c, off + remaining))
            remaining = 0
        for size, c, off in pending:
            heapq.heappush(heap, (-size, c, off))
        pending = []
        remaining = slab_rows
    return (np.concatenate(pieces) if pieces
            else np.arange(0, dtype=np.int64))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "window_id", "slab_id", "subblock", "meta", "sel_src", "sel_dst",
        "remote", "hub_ids",
    ],
    meta_fields=[
        "window_rows", "block_rows", "chunk_edges", "chunks_per_step",
        "slab_rows", "base_rows", "n_steps", "num_rows_out", "hub_rows",
    ],
)
@dataclasses.dataclass(frozen=True)
class SlabPlanSide:
    """One direction (A or Aᵀ) of the slab SpMM.

    Grid steps process ``chunks_per_step`` chunks of ≤``chunk_edges``
    LOCAL edges each, all chunks of a step belonging to one (window,
    slab); ``remote`` is the round-1 gather-path plan for cross-slab
    edges (None when every edge is local).

    Two metadata encodings (exactly one is set):
      * ``meta`` — compact int32 stream; the kernel builds the one-hot
        selectors on the VPU every step (low HBM, VPU-bound: measured
        ~3.3 µs/step of which ~2/3 is selector construction).
      * ``sel_src``/``sel_dst`` — the selectors PREBUILT on the host and
        streamed from HBM (``stream_sel`` mode): zero in-kernel VPU work,
        ~(B+W)·2 bytes/slot of sequential HBM traffic at full bandwidth
        instead (the gather wall this kernel replaces is row-RATE-bound,
        so trading it for sequential streaming is the win)."""

    window_id: jax.Array  # [n_steps] i32 output window (ascending)
    slab_id: jax.Array  # [n_steps] i32 resident-range BASE (units of H)
    subblock: jax.Array  # [n_steps, 1, Q] i32 sub-block within residency
    # [n_steps, 3Q, C] i32: rows [0,Q) src-within-sub-block, [Q,2Q)
    # dst-within-window, [2Q,3Q) f32 weight bitcast (0 = padding slot) —
    # one packed stream so the kernel pipelines ONE metadata DMA per step
    meta: Optional[jax.Array]
    # stream_sel mode: [n_steps, Q·C, B] weighted src one-hot (weights
    # folded; stream dtype) and [n_steps, W, Q·C] 0/1 dst one-hot (int8)
    sel_src: Optional[jax.Array]
    sel_dst: Optional[jax.Array]
    remote: Optional[ChunkPlan]
    # [hub_rows] i32 node ids pinned in the VMEM scratch tail (power-law
    # mode; None = no hub tail).  Gathered once per pass, DMA'd at step 0.
    hub_ids: Optional[jax.Array]
    window_rows: int
    block_rows: int
    chunk_edges: int
    chunks_per_step: int
    slab_rows: int  # resident-range rows R (the VMEM scratch height)
    base_rows: int  # base granularity H (R//H sliding positions)
    n_steps: int
    num_rows_out: int
    hub_rows: int = 0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd", "w_self", "pre_scale"],
    meta_fields=["num_nodes", "n_pad", "slab_dtype"],
)
@dataclasses.dataclass(frozen=True)
class SlabSpMM:
    """Forward + transpose slab plans; self-loop weights are applied as a
    plain elementwise ``w_self ⊙ x`` (no gather, no matmul).

    ``bwd`` is ``None`` for symmetric matrices (A == Aᵀ): the transpose
    side IS ``fwd`` — stored once so the multi-GB selector streams count
    once in XLA's argument accounting (``bwd_side`` resolves it).

    ``pre_scale`` (int8-selector mode): [n_pad] f32 ``rs`` with
    ``weight[e] == rs[src]*rs[dst]`` for every non-self edge (symmetric
    GCN normalization).  The kernel input is pre-scaled ``rs ⊙ x``, the
    aggregated output rows are post-scaled by ``rs[dst]`` (constant per
    row, applied in f32 outside the kernel where it fuses with the
    self-loop add), and BOTH selector streams are 0/1 **int8** — half
    the stream bytes of weighted bf16 on each side.  None = weighted
    src selectors (general edge weights; the dst stream is 0/1 int8
    in every ssel mode)."""

    fwd: SlabPlanSide
    bwd: Optional[SlabPlanSide]  # None when symmetric (bwd IS fwd)
    w_self: jax.Array  # [n_pad] f32
    num_nodes: int
    n_pad: int
    pre_scale: Optional[jax.Array] = None
    # 'compute' (default): the VMEM slab holds compute-dtype rows.
    # 'int8': the kernel input is quantized per pass (absmax/127), the
    # slab + hub scratch hold int8 rows (HALF/QUARTER the VMEM of
    # bf16/f32 → slab_rows can double within the 13 MB cap), and the
    # local src dots run int8 x int8 -> int32 on the MXU.  Opt-in: per-
    # pass quantization perturbs activations AND cotangents (the
    # transpose side quantizes gradients), so the bf16 default path is
    # never silently altered.  Requires sep (int8-selector) mode.
    slab_dtype: str = "compute"

    @property
    def bwd_side(self) -> SlabPlanSide:
        """The transpose plan (``fwd`` itself for symmetric matrices)."""
        return self.bwd if self.bwd is not None else self.fwd


def _residency_base(src, dst, n_pad, W, H, R):
    """Per-window resident-range base (in H-bin units) + per-edge local
    mask: the R-row span covering the most of each window's in-edge
    sources, found by a sliding-window histogram over H-row bins."""
    n_windows = -(-n_pad // W)
    win = dst // W
    n_bins = n_pad // H
    span = R // H
    hist = np.zeros((n_windows, n_bins), dtype=np.int32)
    np.add.at(hist, (win, src // H), 1)
    sliding = np.cumsum(hist, axis=1)
    pad = np.zeros((n_windows, 1), dtype=sliding.dtype)
    sliding = np.concatenate([pad, sliding], axis=1)
    cover = sliding[:, span:] - sliding[:, :-span]  # [n_windows, bins-span+1]
    base = np.argmax(cover, axis=1).astype(np.int64)  # [n_windows]
    # hysteresis: keep the previous window's base when it covers nearly as
    # many sources — consecutive windows of one cluster then share one
    # residency and the (R x F) slab DMA fires per CLUSTER, not per window
    best = cover[np.arange(n_windows), base]
    for w in range(1, n_windows):
        pb = base[w - 1]
        if cover[w, pb] >= 0.98 * best[w]:
            base[w] = pb
    ebase = base[dst // W]
    local = (src // H >= ebase) & (src // H < ebase + span)
    return base, local


# auto hub mode (hub_rows=-1): the measured win/loss endpoints are in
# BENCH.md "Hub-resident scratch tail" — a 6144-row tail next to a 16K
# slab beat the 24K no-hub default by 7% on a power-law graph where the
# top-6144 remote sources covered ~32% of remote slots, and is a small
# loss on uniform graphs where they cover <10%.
_AUTO_HUB_ROWS = 6144
_AUTO_HUB_SLAB_ROWS = 16384  # R where the 6144-row tail still fits VMEM
_AUTO_HUB_COVERAGE = 0.20  # min fraction of remote slots the tail captures
_AUTO_HUB_REMOTE_SHARE = 0.10  # min remote fraction of all edges
_AUTO_HUB_MIN_PAD = 8 * _AUTO_HUB_ROWS  # stay inside the measured regime
_AUTO_HUB_MAX_PAD = 16 * _AUTO_HUB_SLAB_ROWS  # ... on BOTH ends: the
# measured WIN is 169K-powerlaw (R16K covers ~10% of rows; 62.0 vs
# 66.4 ms no-hub); the measured LOSS is clustered-1M-powerlaw (R16K
# covers 1.6%; 798 vs 729 ms no-hub, round-5 bench_shapes) — shrinking
# the residency 24K->16K costs more remote mass than the tail recovers
# once the graph dwarfs the slab.


def _auto_hub(src, dst, n_pad, window_rows, H, R):
    """Decide the hub tail for ``hub_rows='auto'``: returns
    ``(hub_rows, R)`` — either the measured power-law configuration
    (6144-row tail + 16K slab) or ``(0, R)`` unchanged.  Decision inputs
    measured on the uniform/power-law bench graphs: top-6144 remote-slot
    coverage 0.18 vs 0.41 (scripts in BENCH.md "Hub-resident scratch
    tail"); graphs smaller than ``_AUTO_HUB_MIN_PAD`` rows keep hub off —
    the residency already covers most of them — and graphs larger than
    ``_AUTO_HUB_MAX_PAD`` keep it off because the shrunk slab's lost
    coverage outweighs the tail (both bounds measured, see above)."""
    if n_pad < _AUTO_HUB_MIN_PAD or not len(src):
        return 0, R
    if n_pad > _AUTO_HUB_MAX_PAD:
        print(
            f"[slabs] hub=auto: n_pad {n_pad:,} > {_AUTO_HUB_MAX_PAD:,} "
            "(shrunk-slab coverage too low at this scale) => hub off",
            file=sys.stderr,
        )
        return 0, R
    R_hub = min(R, _AUTO_HUB_SLAB_ROWS)
    _, local = _residency_base(src, dst, n_pad, window_rows, H, R_hub)
    cand = src[~local]
    if len(cand) < _AUTO_HUB_REMOTE_SHARE * len(src):
        return 0, R
    _, cnt = np.unique(cand, return_counts=True)
    top = np.sort(cnt)[::-1][:_AUTO_HUB_ROWS].sum()
    if top < _AUTO_HUB_COVERAGE * len(cand):
        return 0, R
    print(
        f"[slabs] hub=auto: top-{_AUTO_HUB_ROWS} remote coverage "
        f"{top / len(cand):.2f} => hub ON (R={R_hub})",
        file=sys.stderr,
    )
    return _AUTO_HUB_ROWS, R_hub


_AUTO_INT8_SLAB_ROWS = 49152  # doubled residency (bf16 R24576 x2)
_AUTO_INT8_MIN_REMOVED_FRAC = 0.20  # min remote-edge-mass reduction
_AUTO_INT8_MIN_REMOVED = 500_000  # absolute floor: covers the ~2.5 ms
#                                   quantize overhead (BENCH.md int8 mode)
_AUTO_INT8_MAX_RANGES = 12  # int8's window is graphs a HANDFUL of
# resident ranges wide: the measured WIN is 400K nodes (8.1 ranges,
# +12.5% end-to-end); the measured LOSSES are 1M-uniform (20 ranges,
# R49K covers ~5% of rows, quantize overhead never bought back — BENCH
# round 3) and clustered-power-law 1M, where picking int8 additionally
# DISABLES the hub tail that graph actually needs (round 5).  Beyond
# ~12 ranges the mass-reduction thresholds alone misfire.


def choose_slab_dtype(num_edges, loc_lo, loc_hi, n_pad):
    """Decide ``slab_dtype='auto'`` from the two packings' sampled
    localities (``reorder_for_slabs(alt_slab_rows=...)``): int8 +
    doubled residency only when repacking at the doubled height removes
    enough remote-edge mass to buy back the per-pass quantize cost.
    Thresholds from the round-3 measurements (BENCH.md "int8 slab
    mode"): arxiv-169K removes 5% and LOSES 2.5 ms; 400K/10M removes 30%
    and WINS 12.5% end-to-end; 1M-uniform removes ~5% and loses."""
    if n_pad < 2 * _AUTO_INT8_SLAB_ROWS:
        # graphs ~the residency height keep bf16: nearly everything is
        # already local and the quantize pass is pure overhead
        return "compute"
    if n_pad > _AUTO_INT8_MAX_RANGES * _AUTO_INT8_SLAB_ROWS:
        # far outside the measured-win window (see _AUTO_INT8_MAX_RANGES):
        # doubled residency covers too small a row fraction to pay for
        # the quantize pass, and bf16 keeps the hub tail available
        print(
            f"[slabs] slab_dtype=auto: n_pad {n_pad:,} > "
            f"{_AUTO_INT8_MAX_RANGES} resident ranges => bf16",
            file=sys.stderr,
        )
        return "compute"
    rem_lo = (1.0 - loc_lo) * num_edges
    rem_hi = (1.0 - loc_hi) * num_edges
    removed = rem_lo - rem_hi
    frac = removed / max(rem_lo, 1.0)
    pick = (frac >= _AUTO_INT8_MIN_REMOVED_FRAC
            and removed >= _AUTO_INT8_MIN_REMOVED)
    print(
        f"[slabs] slab_dtype=auto: remote edge mass {rem_lo:,.0f} "
        f"@R24576 -> {rem_hi:,.0f} @R{_AUTO_INT8_SLAB_ROWS} "
        f"(-{100 * frac:.0f}%) => "
        f"{'int8' if pick else 'bf16 (below threshold)'}",
        file=sys.stderr,
    )
    return "int8" if pick else "compute"


class SelectorBudgetError(ValueError):
    """The prebuilt ssel selector streams would exceed the HBM budget —
    callers (``preprocess_graph``) fall back to the meta-mode kernel
    (in-kernel selector build: O(E) plan bytes, ~20% slower step)."""

    def __init__(self, nbytes: int, budget: int):
        super().__init__(
            f"stream_sel selector arrays would be {nbytes / 2**20:,.0f} MB "
            f"(> budget {budget / 2**20:,.0f} MB)"
        )
        self.nbytes = nbytes
        self.budget = budget


def _build_side(
    src, dst, weight, n_pad, *, W, B, C, Q, R, H, min_pair,
    remote_window_rows=1024, remote_chunk_edges=1024, stream_sel=None,
    sep_rs=None, hub_rows=0, sel_budget_bytes=8 << 30,
) -> SlabPlanSide:
    """Edges must be relabeled to the packed order and EXCLUDE self-loops.

    Each output window gets a PER-WINDOW resident range: the R-row span
    (at H-row granularity) covering the most of its in-edges' sources —
    found by a sliding-window histogram, so it tracks the window's cluster
    even when packing split the cluster across a slab boundary.  Edges
    whose src falls in the range are LOCAL (one-hot matmuls against the
    VMEM-resident span); the rest, plus (window, sub-block) groups smaller
    than ``min_pair`` (their chunks would be mostly padding), go REMOTE
    via the round-1 gather plan."""
    n_windows = -(-n_pad // W)
    base, local = _residency_base(src, dst, n_pad, W, H, R)
    win = dst // W
    ebase = base[win]

    # ---- hub rows: power-law graphs concentrate the CROSS-cluster edges
    # on high-degree sources; the top ``hub_rows`` out-of-range sources by
    # remote-edge count live in a PERMANENT tail of the kernel's VMEM
    # scratch (gathered once per pass — hub_rows descriptors, not one per
    # edge), turning their edges into local one-hot MXU work.  Hub chunks
    # address sub-blocks ``R//B + k``; the kernel copies the gathered
    # [hub_rows, F] block in at grid step 0. ----
    hub_ids = None
    hub_pos_of = None
    if hub_rows > 0:
        assert hub_rows % B == 0, "hub_rows must be a multiple of block_rows"
        cand = src[~local]
        if len(cand):
            ids, cnt = np.unique(cand, return_counts=True)
            # descending remote-degree order: the densest hubs pack into
            # the first sub-blocks, so (window, hub-sub) chunk fill stays
            # high where most hub edges land
            top = ids[np.argsort(cnt)[::-1][:hub_rows]]
            hub_ids = np.full(hub_rows, n_pad - 1, dtype=np.int64)
            hub_ids[: len(top)] = top
            hub_pos_of = np.full(n_pad, -1, dtype=np.int64)
            hub_pos_of[top] = np.arange(len(top))
            is_hub = ~local & (hub_pos_of[src] >= 0)
        else:
            hub_ids = np.full(hub_rows, n_pad - 1, dtype=np.int64)
            hub_pos_of = np.full(n_pad, -1, dtype=np.int64)
            is_hub = np.zeros(len(src), dtype=bool)
    else:
        is_hub = np.zeros(len(src), dtype=bool)
    local_any = local | is_hub

    # per-edge sub-block + row-within-block (hub edges index the tail)
    sub_all = (src - ebase * H) // B
    rel_all = (src - ebase * H) % B
    if hub_rows > 0:
        hpos = np.where(is_hub, hub_pos_of[src], 0)
        sub_all = np.where(is_hub, R // B + hpos // B, sub_all)
        rel_all = np.where(is_hub, hpos % B, rel_all)

    # drop tiny (window, sub-block) groups to keep chunk fill high —
    # EXCEPT hub groups: the hub tail is permanently resident (no per-group
    # DMA cost), and even a 2-edge hub chunk beats two 9.7 ns/edge remote
    # gathers on slot+dot cost
    if min_pair > 1:
        # the (window, sub) key range is small (~n_windows * subs), so a
        # dense bincount beats np.unique's O(E log E) sort at scale
        n_subs = R // B + hub_rows // B + 1
        key = win * n_subs + np.where(local_any, sub_all, 0)
        cnt = np.bincount(key[local_any], minlength=n_windows * n_subs)
        small = np.zeros(len(src), dtype=bool)
        la = np.flatnonzero(local_any)
        small[la] = cnt[key[la]] < min_pair
        local_any = local_any & ~(small & ~is_hub)
    ls, ld, lw = src[local_any], dst[local_any], weight[local_any]
    rs, rd, rw = src[~local_any], dst[~local_any], weight[~local_any]

    # ---- local: sort by (window, sub-block, src) and cut chunks ----
    lwin = ld // W
    lsub = sub_all[local_any]
    ls_rel = rel_all[local_any]
    # one combined-key stable sort instead of lexsort's three passes
    # (ls < n_pad, lsub < n_subs: the packed key stays well inside int64)
    order = np.argsort(
        (lwin * (R // B + hub_rows // B + 1) + lsub) * n_pad + ls,
        kind="stable",
    )
    ls, ld, lw, lwin, lsub, ls_rel = (
        ls[order], ld[order], lw[order], lwin[order], lsub[order],
        ls_rel[order],
    )
    # group key changes -> chunk boundaries (also every C edges in-group)
    n_local = len(ls)
    if n_local:
        new_group = np.empty(n_local, dtype=bool)
        new_group[0] = True
        new_group[1:] = (lwin[1:] != lwin[:-1]) | (lsub[1:] != lsub[:-1])
        group_id = np.cumsum(new_group) - 1
        pos_in_group = np.arange(n_local) - np.maximum.accumulate(
            np.where(new_group, np.arange(n_local), 0)
        )
        # chunk boundaries: new group OR crossing a C-edge multiple —
        # the edges are already in (group, pos) order, so boundaries are
        # found by adjacent comparison (no O(E log E) np.unique sort)
        new_chunk = np.empty(n_local, dtype=bool)
        new_chunk[0] = True
        new_chunk[1:] = new_group[1:] | (
            pos_in_group[1:] // C != pos_in_group[:-1] // C
        )
        chunk_idx = np.flatnonzero(new_chunk)
        slot = np.cumsum(new_chunk) - 1  # chunk id per edge
        n_chunks = len(chunk_idx)
        chunk_win = lwin[chunk_idx]
        chunk_sub = lsub[chunk_idx]
        slot_in_chunk = pos_in_group % C
    else:
        n_chunks = 0
        chunk_win = np.zeros(0, dtype=np.int64)
        chunk_sub = np.zeros(0, dtype=np.int64)

    # A step never packs chunks from two windows, so Q beyond the busiest
    # window's chunk count is pure slot padding (on small graphs the
    # default Q=128 would pad every step to 128 chunks): shrink to fit.
    if n_chunks:
        Q = min(Q, int(np.bincount(chunk_win.astype(np.int64)).max()))
    Q = max(Q, 1)

    # ---- pack chunks into steps: Q chunks per step, one window per step.
    # meta mode: EVERY window emits >= 1 step (its out block must be
    # written).  stream_sel mode: the kernel aliases ``prev`` onto the
    # output, so chunk-less windows are SKIPPED entirely (their rows pass
    # through untouched) — ~20% of grid steps on the bench graph.
    # Vectorized (round 4): chunks arrive sorted by window, so each
    # chunk's step is its position-within-window // Q plus the window's
    # step offset — no python loop over windows/chunks. ----
    cnt_w = np.bincount(chunk_win, minlength=n_windows) if n_chunks else (
        np.zeros(n_windows, dtype=np.int64)
    )
    steps_per_w = -(-cnt_w // Q)
    if stream_sel is None:
        steps_per_w = np.maximum(steps_per_w, 1)
    step_off = np.zeros(n_windows + 1, dtype=np.int64)
    np.cumsum(steps_per_w, out=step_off[1:])
    steps_win = np.repeat(np.arange(n_windows, dtype=np.int64), steps_per_w)
    if len(steps_win) == 0:  # degenerate: no local edges at all
        steps_win = np.zeros(1, dtype=np.int64)
    n_steps = len(steps_win)
    if n_chunks:
        w_start = np.zeros(n_windows + 1, dtype=np.int64)
        np.cumsum(cnt_w, out=w_start[1:])
        pos_in_w = np.arange(n_chunks) - w_start[chunk_win]
        chunk_step = step_off[chunk_win] + pos_in_w // Q
        chunk_q = pos_in_w % Q

    subblock = np.zeros((n_steps, 1, Q), dtype=np.int32)
    if stream_sel is not None:
        sdt = np.dtype(_np_stream_dtype(stream_sel))
        src_dt = np.dtype(np.int8) if sep_rs is not None else sdt
        # the dst selector is ALWAYS 0/1 (weights live in sel_src, or — sep
        # mode — rs[dst] is hoisted to an XLA post-scale of the output rows,
        # see SlabSpMM.pre_scale): stream it as int8 in every mode.  0/1
        # entries convert exactly, so the f32 path stays bit-exact.
        dst_dt = np.dtype(np.int8)
        sel_bytes = n_steps * Q * C * (
            B * src_dt.itemsize + W * dst_dt.itemsize
        )
        if sel_bytes > sel_budget_bytes:
            raise SelectorBudgetError(sel_bytes, sel_budget_bytes)
        sel_src_a = np.zeros((n_steps, Q * C, B), dtype=src_dt)
        sel_dst_a = np.zeros((n_steps, W, Q * C), dtype=dst_dt)
    else:
        lsrc_a = np.zeros((n_steps, Q, C), dtype=np.int32)
        ldst_a = np.zeros((n_steps, Q, C), dtype=np.int32)
        wgt_a = np.zeros((n_steps, Q, C), dtype=np.float32)
    if n_local:
        e_chunk = slot  # chunk id per edge (cumsum of chunk boundaries)
        e_step = chunk_step[e_chunk]
        e_q = chunk_q[e_chunk]
        subblock[chunk_step, 0, chunk_q] = chunk_sub.astype(np.int32)
        if stream_sel is not None:
            e_slot = e_q * C + slot_in_chunk
            if sep_rs is not None:
                # separable weights: 0/1 int8 src selector (x arrives
                # pre-scaled by rs[src]); rs[dst] — constant per output
                # row — is hoisted out of the kernel to a post-scale
                sel_src_a[e_step, e_slot, ls_rel] = 1
            else:
                sel_src_a[e_step, e_slot, ls_rel] = lw.astype(np.float32)
            sel_dst_a[e_step, ld % W, e_slot] = 1
        else:
            lsrc_a[e_step, e_q, slot_in_chunk] = ls_rel.astype(np.int32)
            ldst_a[e_step, e_q, slot_in_chunk] = (ld % W).astype(np.int32)
            wgt_a[e_step, e_q, slot_in_chunk] = lw.astype(np.float32)

    # ---- remote: round-1 gather plan over the padded node range.
    # LARGE windows/chunks: the chunk kernel runs ONE chunk per grid step,
    # so at C=128 the ~1 µs/step overhead dominated (measured 16.7 ns/edge
    # vs the 7.4 ns gather floor).  W=C=1024 cuts steps ~8x at ~89% fill
    # (remote edges average ~300/1024-row window on the bench graph). ----
    remote = None
    if len(rs):
        order = np.argsort(rd, kind="stable")
        # sep mode: x arrives pre-scaled by rs[src] and the output rows get
        # post-scaled by rs[dst], so the remote plan carries unit weights
        rw_eff = np.ones_like(rw) if sep_rs is not None else rw
        remote = _build_plan(
            rs[order], rd[order], rw_eff[order], n_pad,
            chunk_edges=remote_chunk_edges, window_rows=remote_window_rows,
        )

    steps_win = np.asarray(steps_win, dtype=np.int64)
    if stream_sel is not None:
        meta = None
        sel_src = jnp.asarray(sel_src_a)
        sel_dst = jnp.asarray(sel_dst_a)
    else:
        # [n_steps, 3Q, C] i32 packed stream
        meta = jnp.asarray(
            np.concatenate([lsrc_a, ldst_a, wgt_a.view(np.int32)], axis=1)
        )
        sel_src = sel_dst = None
    return SlabPlanSide(
        window_id=jnp.asarray(steps_win.astype(np.int32)),
        slab_id=jnp.asarray(base[steps_win].astype(np.int32)),
        subblock=jnp.asarray(subblock),
        meta=meta,
        sel_src=sel_src,
        sel_dst=sel_dst,
        remote=remote,
        hub_ids=(None if hub_ids is None
                 else jnp.asarray(hub_ids.astype(np.int32))),
        hub_rows=hub_rows,
        window_rows=W,
        block_rows=B,
        chunk_edges=C,
        chunks_per_step=Q,
        slab_rows=R,
        base_rows=H,
        n_steps=n_steps,
        num_rows_out=n_windows * W,
    )


def _np_stream_dtype(name: str):
    if name in ("bf16", "bfloat16"):
        import ml_dtypes

        return ml_dtypes.bfloat16
    assert name in ("f32", "float32"), name
    return np.float32


def _is_symmetric(src, dst, weight, num_nodes) -> bool:
    """True when the (src, dst, w) multiset equals its transpose — the
    normal case for GCN-normalized undirected graphs — so the transpose
    plan can alias the forward plan (half the build time and HBM)."""
    k1 = src * num_nodes + dst
    k2 = dst * num_nodes + src
    o1 = np.argsort(k1, kind="stable")
    o2 = np.argsort(k2, kind="stable")
    return bool(
        np.array_equal(k1[o1], k2[o2])
        and np.allclose(weight[o1], weight[o2], rtol=1e-6, atol=0)
    )


def build_slabs(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_nodes: int,
    *,
    window_rows: int = 128,
    block_rows: int = 128,
    chunk_edges: int = 16,
    chunks_per_step: int = 128,
    slab_rows: int = 16384,
    base_rows: int = 4096,
    min_pair: int = 8,
    remote_window_rows: int = 512,
    remote_chunk_edges: int = 512,
    stream_sel: Optional[str] = None,
    symmetric: Optional[bool] = None,
    sep_rs: Optional[np.ndarray] = None,
    hub_rows: int | str = 0,
    slab_dtype: str = "compute",
    sel_budget_bytes: int = 8 << 30,
) -> SlabSpMM:
    """Build fwd + transpose slab plans.  Edges must already be relabeled
    into the packed (clustered) node order — see
    :func:`reorder_for_slabs`.  ``slab_rows`` is the per-window RESIDENT
    range (VMEM scratch height; base position chosen per window at
    ``base_rows`` granularity).  Self-loop edges are pulled out into the
    elementwise ``w_self`` path.  ``stream_sel`` in {'bf16','f32'} builds
    host-prebuilt streamed selectors instead of in-kernel one-hot
    construction; ``symmetric=None`` auto-detects A == Aᵀ and aliases the
    transpose plan onto the forward plan when it holds.  ``hub_rows`` pins
    the top-K remote sources in a permanent VMEM scratch tail (power-law
    graphs); ``-1``/``'auto'`` enables the measured hub geometry
    (16K slab + 6144-row tail) only when the top sources cover enough
    remote slots to pay for it — see ``_AUTO_HUB_*``.  ``slab_dtype``:
    'compute' (default), 'int8' (quantized, doubled residency), or
    'auto' — int8 only when doubling the residency removes enough remote
    edges to win (the measured 400K-node window, ``_auto_dtype``)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    H = min(base_rows, slab_rows)
    R = slab_rows
    n_pad = max(-(-num_nodes // H) * H, R)
    window_rows = min(window_rows, R)
    block_rows = min(block_rows, H)
    assert R % H == 0 and R % block_rows == 0 and H % block_rows == 0

    self_mask = src == dst
    w_self = np.zeros(n_pad, dtype=np.float32)
    np.add.at(w_self, src[self_mask], weight[self_mask])
    src, dst, weight = src[~self_mask], dst[~self_mask], weight[~self_mask]

    if sep_rs is not None:
        # int8-selector mode is only valid when the edge weights really
        # factor as rs[src]*rs[dst] (symmetric normalization) and the
        # stream is bf16 (the f32 path stays bit-exact vs the oracle);
        # otherwise silently fall back to weighted selectors
        sep_rs = np.asarray(sep_rs, dtype=np.float32)
        ok = (
            stream_sel == "bf16"
            and len(sep_rs) >= num_nodes
            and np.allclose(weight, sep_rs[src] * sep_rs[dst],
                            rtol=1e-5, atol=1e-12)
        )
        if ok:
            sep_rs = np.pad(sep_rs, (0, n_pad - len(sep_rs)))
        else:
            sep_rs = None

    if slab_dtype == "auto":
        # the real decision needs BOTH packings' localities and therefore
        # lives in preprocess_graph (choose_slab_dtype), which owns the
        # reorder; a direct build_slabs caller passing 'auto' gets the
        # bf16 default
        slab_dtype = "compute"
    if hub_rows in (-1, "auto"):
        if stream_sel != "bf16" or slab_dtype != "compute":
            # the auto geometry (16K slab + 6144 tail) is measured for —
            # and only fits VMEM under — the bf16 production path: the
            # f32 slab is capped at 8192 rows (where the tail would blow
            # the 13 MB budget at F=256), and int8 mode exists to GROW
            # the residency, which shrinking to 16K would defeat
            hub_rows = 0
        else:
            # shrinks the slab to the measured hub geometry when the tail
            # triggers, so it fits the VMEM budget next to it
            hub_rows, R = _auto_hub(src, dst, n_pad, window_rows, H, R)
            window_rows = min(window_rows, R)
    if hub_rows > 0:
        if stream_sel is None:
            raise ValueError("hub_rows requires stream_sel (ssel) mode")
        hub_rows = -(-hub_rows // block_rows) * block_rows
    kw = dict(W=window_rows, B=block_rows, C=chunk_edges, Q=chunks_per_step,
              R=R, H=H, min_pair=min_pair,
              remote_window_rows=remote_window_rows,
              remote_chunk_edges=remote_chunk_edges, stream_sel=stream_sel,
              sep_rs=sep_rs, hub_rows=hub_rows,
              sel_budget_bytes=sel_budget_bytes)
    if slab_dtype not in ("compute", "int8"):
        raise ValueError(f"slab_dtype must be 'compute'|'int8', got {slab_dtype!r}")
    if slab_dtype == "int8" and sep_rs is None:
        raise ValueError(
            "slab_dtype='int8' needs separable (sep_rs) weights: the src "
            "selectors must be 0/1 int8 for the int8 MXU dots"
        )
    fwd = _build_side(src, dst, weight, n_pad, **kw)
    if symmetric is None:
        symmetric = _is_symmetric(src, dst, weight, num_nodes)
    # symmetric (A == Aᵀ): store bwd as None, NOT as a second reference
    # to fwd — duplicate pytree leaves become two XLA parameters and the
    # AOT compiler's HBM accounting double-counts the multi-GB selector
    # streams (round-5: the clustered-1M compile OOM'd on exactly this;
    # the consumer resolves None -> fwd via SlabSpMM.bwd_side)
    bwd = None if symmetric else _build_side(dst, src, weight, n_pad, **kw)
    return SlabSpMM(
        fwd=fwd, bwd=bwd, w_self=jnp.asarray(w_self),
        num_nodes=int(num_nodes), n_pad=int(n_pad),
        pre_scale=None if sep_rs is None else jnp.asarray(sep_rs),
        slab_dtype=slab_dtype,
    )


def reorder_for_slabs(
    edge_index: np.ndarray,
    num_nodes: int,
    *,
    slab_rows: int = 8192,
    iters: Optional[int] = None,
    seed: int = 0,
    restarts: int = 4,
    score_sample: int = 2_000_000,
    alt_slab_rows: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Cluster + pack: returns ``(perm, inv)`` with ``perm[new] = old``
    and ``inv[old] = new``.  Relabel edges as ``inv[src], inv[dst]`` and
    permute node-indexed arrays as ``arr[perm]``.  With
    ``alt_slab_rows``, additionally packs the winning clustering at that
    slab height and returns ``((perm, inv, locality), (alt_perm,
    alt_inv, alt_locality))`` — the ``slab_dtype='auto'`` decision input
    (one LPA pass, two packings).

    ``iters`` is the hard sweep CAP per restart (the objective stop
    usually fires first; it cannot fire before the C++ MIN_STOP=40).
    ``None`` (default) resolves to 40 for graphs ≤300K nodes and 96
    above — deep convergence matters more at scale (see comment below);
    an explicitly-passed value is honored exactly at any size."""
    src, dst = np.asarray(edge_index)
    # self-loops bias every node toward keeping its own label and stall
    # convergence — cluster on the loop-free edge list
    m = src != dst
    srcm, dstm = src[m], dst[m]
    from sgformer_tpu.native.api import lpa_cluster_native

    # C++ threaded sweeps: ~43x the numpy lexsort version (57 s -> 1.3 s on
    # the 2.5M-edge bench graph), which buys multi-seed RESTARTS — LPA
    # cluster quality is seed-dependent (measured locality 0.732-0.752
    # across seeds on the bench graph), so take the best of ``restarts``
    # by same-cluster edge fraction.  numpy stays as the no-toolchain
    # fallback and quality oracle (single seed: it costs minutes).
    #
    # Large-graph cost controls (round 4, the 1M-node prep wall):
    # * restarts run to CONVERGENCE, not a fixed depth: the C++ sweep
    #   loop (csrc::lpa_cluster) stops when a sweep changes zero labels,
    #   or — checked every CHECK=8 sweeps once past MIN_STOP=40 — when
    #   the sampled same-label edge fraction gained < MIN_GAIN=0.3 pp
    #   over the last 8 sweeps (uniform graphs churn forever at a flat
    #   level and exit at ~40; clustered graphs keep gaining and run
    #   deep).  Convergence depth is strongly graph-dependent: a
    #   1M-node/25K-community graph converges at ~56 sweeps with
    #   locality 0.18 vs 0.04 at sweep 40, while a 12-sweep scout left
    #   every 400K seed at pre-convergence 0.12 and randomized the
    #   restart pick (3.22M → 3.95M remote slots before this was fixed).
    #   Large graphs therefore get a GENEROUS cap and trust the
    #   objective stop for cost control.
    # * locality is scored on a ~``score_sample``-edge stride sample
    #   (restart spread is 2-25 pp; a 2M sample has <0.1 pp noise).
    if len(srcm) > score_sample:
        stride = len(srcm) // score_sample
        s_src, s_dst = srcm[::stride], dstm[::stride]
    else:
        s_src, s_dst = srcm, dstm
    if iters is None:
        run_iters = 40 if num_nodes <= 300_000 else 96
    else:
        run_iters = iters  # explicit caller budget: a cap, never a floor
    clusters = None
    best = -1.0
    for r in range(restarts):
        c = lpa_cluster_native(
            srcm, dstm, num_nodes, run_iters, num_nodes + 1, seed + r
        )
        if c is None:
            break
        # score by the TRUE objective — same-slab edge fraction AFTER
        # packing (same-cluster fraction alone misleads: an oversized
        # cluster scores high but splits across slabs)
        p = cluster_pack_perm(c, slab_rows)
        iv = np.empty(num_nodes, dtype=np.int64)
        iv[p] = np.arange(num_nodes)
        loc = locality_fraction(iv[s_src], iv[s_dst], slab_rows)
        if loc > best:
            best, clusters = loc, c
        if r == 0 and loc < 0.05:
            # structureless graph (uniform-random): every seed lands at
            # the same ~2% locality (measured spread 0.0002) — further
            # restarts are pure cost, and the C++ objective-stop already
            # capped this run's sweeps
            break
    if clusters is None:
        clusters = label_propagation(
            srcm, dstm, num_nodes, iters=run_iters,
            max_size=num_nodes + 1, seed=seed,
        )
    perm = cluster_pack_perm(clusters, slab_rows)
    inv = np.empty(num_nodes, dtype=np.int64)
    inv[perm] = np.arange(num_nodes)
    if alt_slab_rows is None:
        return perm, inv
    # pack the SAME winning labels at the alternative slab height and
    # score both on the edge sample — the slab_dtype='auto' decision
    # input (int8 halves the slab bytes so the residency can double, but
    # it only pays when the repack at the doubled height captures more
    # cluster mass — preprocess_graph compares these localities)
    loc = locality_fraction(inv[s_src], inv[s_dst], slab_rows)
    alt_perm = cluster_pack_perm(clusters, alt_slab_rows)
    alt_inv = np.empty(num_nodes, dtype=np.int64)
    alt_inv[alt_perm] = np.arange(num_nodes)
    alt_loc = locality_fraction(
        alt_inv[s_src], alt_inv[s_dst], alt_slab_rows
    )
    return (perm, inv, loc), (alt_perm, alt_inv, alt_loc)


def locality_fraction(src, dst, slab_rows: int) -> float:
    """Diagnostic: fraction of non-self edges whose endpoints share a slab."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    m = src != dst
    if not m.any():
        return 1.0
    return float(
        np.mean((src[m] // slab_rows) == (dst[m] // slab_rows))
    )
