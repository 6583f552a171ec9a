"""Host-side neighbor sampler — the TPU-native replacement for PyG's
``NeighborLoader`` (C++ sampler + worker processes) used by the papers100M
tier (``/root/reference/100M/nb-sample.py:125-151``, fanout [15,10,5]).

Semantics match PyG's sampler: layer-wise expansion from the seed nodes,
sampling WITHOUT replacement up to ``fanout[l]`` in-neighbors per node per
hop; sampled edges point child → parent, the union of visited nodes forms
the subgraph with seeds first, and training losses read only the first
``batch_size`` output rows (``nb-sample.py:27-35``).

TPU-first differences: every batch is padded to static (node, edge) caps so
ONE compiled train step serves the whole epoch, and the sampler is
vectorized numpy over the frontier (no per-node Python loop) — the role
PyG fills with C++ worker processes.  A double-buffered prefetch thread
overlaps sampling with device compute (see ``PrefetchIterator``).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """In-neighbor CSR on the host (dst -> its in-neighbors)."""

    indptr: np.ndarray  # [N+1] int64
    indices: np.ndarray  # [E]  int32/int64, src of each in-edge

    @classmethod
    def from_edge_index(cls, edge_index: np.ndarray, num_nodes: int) -> "CSRGraph":
        src, dst = np.asarray(edge_index)
        order = np.argsort(dst, kind="stable")
        src = src[order]
        indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(np.bincount(dst, minlength=num_nodes), out=indptr[1:])
        return cls(indptr=indptr, indices=src.astype(np.int64))

    @property
    def num_nodes(self) -> int:
        return len(self.indptr) - 1


@dataclasses.dataclass
class SampledBatch:
    """Static-shape sampled subgraph; seeds occupy rows [0, num_seeds)."""

    node_ids: np.ndarray  # [node_cap] global ids (0-padded)
    edge_src: np.ndarray  # [edge_cap] local, dst-sorted
    edge_dst: np.ndarray  # [edge_cap] local
    edge_weight: np.ndarray  # [edge_cap] f32, 0 on padding
    node_mask: np.ndarray  # [node_cap] 1.0 on real nodes
    num_seeds: int
    num_nodes: int  # real nodes


def _sample_neighbors(
    csr: CSRGraph, frontier: np.ndarray, fanout: int, rng: np.random.Generator
):
    """Vectorized fanout sampling: for each frontier node take min(deg, k)
    distinct in-neighbors.  Returns (src_global, dst_global) edge arrays.

    Uses the C++ kernel (csrc/graph_kernels.cpp) when compiled — the role
    PyG's C++ sampler plays behind NeighborLoader — with this numpy path
    as the always-available fallback."""
    from sgformer_tpu.native.api import sample_neighbors_native

    native = sample_neighbors_native(
        csr.indptr, csr.indices, np.asarray(frontier),
        fanout, int(rng.integers(2**62)),
    )
    if native is not None:
        return native
    deg = csr.indptr[frontier + 1] - csr.indptr[frontier]
    k = np.minimum(deg, fanout)
    # random offsets: for deg<=fanout take all; else a random slice start of
    # a permuted-window approximation — draw k distinct offsets via sorting
    # random floats (Gumbel-topk style, fully vectorized)
    total = int(k.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    rep_node = np.repeat(frontier, k)
    rep_start = np.repeat(csr.indptr[frontier], k)
    rep_deg = np.repeat(deg, k)
    # positions within each node's neighbor list: for nodes where k == deg,
    # enumerate 0..deg-1; where k < deg, draw k random (with-replacement)
    # offsets — the dedup pass below coalesces duplicates.
    enum = np.arange(total) - np.repeat(np.cumsum(k) - k, k)
    rand = (rng.random(total) * rep_deg).astype(np.int64)
    take_all = np.repeat(deg <= fanout, k)
    offset = np.where(take_all, enum, rand)
    src = csr.indices[rep_start + offset]
    return src, rep_node


class NeighborSampler:
    """Layer-wise neighbor sampling producing padded static-shape batches."""

    def __init__(
        self,
        edge_index: np.ndarray,
        num_nodes: int,
        fanouts: Sequence[int] = (15, 10, 5),
        batch_size: int = 1000,
        *,
        node_cap: Optional[int] = None,
        edge_cap: Optional[int] = None,
        seed: int = 0,
        use_native: bool = True,
    ):
        self.use_native = use_native
        # a prebuilt CSRGraph (e.g. data/prep.py's out-of-core builder at
        # 10M+ nodes) skips the in-RAM edge sort entirely
        if isinstance(edge_index, CSRGraph):
            assert edge_index.num_nodes == num_nodes, (
                edge_index.num_nodes, num_nodes)
            self.csr = edge_index
        else:
            self.csr = CSRGraph.from_edge_index(edge_index, num_nodes)
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        # worst-case: seeds * prod(1 + fanout_l) nodes; cap below worst case
        # (real graphs overlap heavily), overflow is trimmed deterministically
        worst = batch_size
        cap = batch_size
        for f in self.fanouts:
            worst = worst * f
            cap += worst
        # default cap: generous multiple of the batch (the [15,10,5]
        # fanout's realistic expansion) — soak telemetry showed x64
        # truncating hop-3 on dense graphs
        self.node_cap = node_cap or min(cap, batch_size * 160)
        self.edge_cap = edge_cap or self.node_cap * max(self.fanouts)
        # telemetry: how often the static caps clipped a batch (raise the
        # caps if these grow — clipped batches silently drop frontier
        # nodes/edges, which biases training)
        self.truncated_node_batches = 0
        self.truncated_edge_batches = 0

    def sample(self, seeds: np.ndarray, rng_seed: Optional[int] = None
               ) -> SampledBatch:
        """One padded batch.  Uses the C++ full-batch pipeline
        (csrc/graph_kernels.cpp::sample_batch — sampling, relabel,
        self-loops, dst sort, weights, padding in one GIL-released call;
        the role of PyG's 12 C++ loader workers) with the numpy path below
        as the always-available oracle (``use_native=False``).
        ``rng_seed`` pins the batch's randomness (the threaded epoch
        pre-draws seeds because numpy Generators are not thread-safe)."""
        seeds = np.asarray(seeds, dtype=np.int64)
        if self.use_native:
            from sgformer_tpu.native.api import sample_batch_native

            native = sample_batch_native(
                self.csr.indptr, self.csr.indices, seeds, self.fanouts,
                self.node_cap, self.edge_cap,
                int(self.rng.integers(2**62))
                if rng_seed is None else int(rng_seed),
            )
            if native is not None:
                node_ids, src, dst, w, mask, n_real, trunc = native
                self.truncated_node_batches += int(trunc[0])
                self.truncated_edge_batches += int(trunc[1])
                return SampledBatch(
                    node_ids=node_ids, edge_src=src, edge_dst=dst,
                    edge_weight=w, node_mask=mask, num_seeds=len(seeds),
                    num_nodes=n_real,
                )
        return self._sample_numpy(seeds)

    def _sample_numpy(self, seeds: np.ndarray) -> SampledBatch:
        all_src, all_dst = [], []
        nodes = seeds  # seeds first; later hops appended (vectorized)
        frontier = seeds
        for fanout in self.fanouts:
            src, dst = _sample_neighbors(self.csr, frontier, fanout, self.rng)
            if len(src) == 0:
                break
            # dedup (dst, src) pairs from with-replacement draws
            key = dst * self.csr.num_nodes + src
            _, uniq_idx = np.unique(key, return_index=True)
            src, dst = src[uniq_idx], dst[uniq_idx]
            all_src.append(src)
            all_dst.append(dst)
            new = np.setdiff1d(src, nodes)
            frontier = new
            nodes = np.concatenate([nodes, new])
            if len(nodes) >= self.node_cap:
                break

        if len(nodes) > self.node_cap:
            self.truncated_node_batches += 1
        node_ids = nodes[: self.node_cap]
        if all_src:
            src = np.concatenate(all_src)
            dst = np.concatenate(all_dst)
            # vectorized relabel via sorted lookup (nodes beyond the cap drop)
            sorter = np.argsort(node_ids)
            sorted_ids = node_ids[sorter]
            s_pos = np.searchsorted(sorted_ids, src)
            d_pos = np.searchsorted(sorted_ids, dst)
            s_pos = np.minimum(s_pos, len(sorted_ids) - 1)
            d_pos = np.minimum(d_pos, len(sorted_ids) - 1)
            keep = (sorted_ids[s_pos] == src) & (sorted_ids[d_pos] == dst)
            src = sorter[s_pos[keep]]
            dst = sorter[d_pos[keep]]
        else:
            src = dst = np.empty(0, dtype=np.int64)
        # add self-loops on real nodes (reference adds them globally,
        # nb-sample.py:80)
        n_real = len(node_ids)
        loop = np.arange(n_real, dtype=np.int64)
        src = np.concatenate([src, loop])
        dst = np.concatenate([dst, loop])
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        from sgformer_tpu.graph import gcn_norm_weights

        w = gcn_norm_weights(src, dst, n_real).astype(np.float32)
        e = len(src)
        if e > self.edge_cap:
            self.truncated_edge_batches += 1
            src, dst, w = src[: self.edge_cap], dst[: self.edge_cap], w[: self.edge_cap]
            e = self.edge_cap
        pad_e = self.edge_cap - e
        src = np.concatenate([src, np.zeros(pad_e, dtype=np.int64)])
        dst = np.concatenate(
            [dst, np.full(pad_e, max(n_real - 1, 0), dtype=np.int64)]
        )
        w = np.concatenate([w, np.zeros(pad_e, dtype=np.float32)])
        pad_n = self.node_cap - n_real
        node_ids = np.concatenate([node_ids, np.zeros(pad_n, dtype=np.int64)])
        node_mask = np.zeros(self.node_cap, dtype=np.float32)
        node_mask[:n_real] = 1.0
        return SampledBatch(
            node_ids=node_ids,
            edge_src=src.astype(np.int32),
            edge_dst=dst.astype(np.int32),
            edge_weight=w,
            node_mask=node_mask,
            num_seeds=len(seeds),
            num_nodes=n_real,
        )

    def epoch(
        self,
        seed_pool: np.ndarray,
        shuffle: bool = True,
        workers: int = 0,
        drop_last: bool = False,
    ) -> Iterator[SampledBatch]:
        """Batch iterator over the seed pool.  The remainder batch IS
        yielded (``num_seeds < batch_size``): the reference's
        NeighborLoader has no drop_last, and its loop reads the per-batch
        ``graph.batch_size`` (``100M/nb-sample.py:174,181``) so the tail
        seeds train and evaluate — static shapes here come from the
        node/edge caps, which pad the tail batch like any other.
        ``workers > 0`` samples batches concurrently in a thread pool —
        the C++ sampler releases the GIL, so this is real parallelism
        (PyG's ``num_workers=12`` equivalent, ``nb-sample.py:131``) with
        in-order delivery."""
        pool = np.asarray(seed_pool)
        if shuffle:
            pool = pool[self.rng.permutation(len(pool))]
        last = len(pool) - self.batch_size + 1 if drop_last else len(pool)
        starts = range(0, last, self.batch_size)
        if workers <= 0:
            for i in starts:
                yield self.sample(pool[i: i + self.batch_size])
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # pre-draw per-batch seeds: numpy Generators are not thread-safe
        seeds = [int(self.rng.integers(2**62)) for _ in starts]
        # BOUNDED submission window: submitting the whole epoch up front
        # lets producers that outrun the consumer buffer every completed
        # batch (~50 MB each at papers100M caps — an unbounded-memory
        # hazard over a 1200-batch epoch).  At most ``2*workers`` batches
        # are in flight or awaiting consumption; in-order delivery.
        window = max(2 * workers, 2)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            work = iter(zip(starts, seeds))
            futs = deque()

            def submit_next():
                try:
                    i, sd = next(work)
                except StopIteration:
                    return
                futs.append(
                    ex.submit(self.sample, pool[i: i + self.batch_size], sd)
                )

            for _ in range(window):
                submit_next()
            while futs:
                f = futs.popleft()
                batch = f.result()
                submit_next()
                yield batch


class _ProducerError:
    """Wrapper carrying an exception from the prefetch thread to the
    consuming thread (re-raised by ``PrefetchIterator.__next__``)."""

    def __init__(self, error: BaseException):
        self.error = error


class PrefetchIterator:
    """Run a batch iterator in a background thread with a bounded queue —
    the sampler works on batch k+1..k+depth while the device runs batch k
    (the reference leans on DataLoader worker processes for this,
    ``nb-sample.py:131-132``)."""

    def __init__(self, iterator, depth: int = 2):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self.thread = threading.Thread(
            target=self._fill, args=(iterator,), daemon=True
        )
        self.thread.start()

    def _fill(self, iterator):
        try:
            for item in iterator:
                self.q.put(item)
        except BaseException as e:  # propagate producer errors to consumer
            # without this, a host-side error (e.g. an unservable batch)
            # would silently truncate the epoch as a StopIteration
            self.q.put(_ProducerError(e))
        finally:
            self.q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, _ProducerError):
            raise item.error
        return item
