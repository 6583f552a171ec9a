"""Memory-mapped node-feature store for 100M-node graphs.

The reference loads ogbn-papers100M's 111M x 128 feature matrix (~57 GB)
fully into host RAM before training (``/root/reference/100M/nb-sample.py:
78-81``).  Here features live in an on-disk ``np.memmap``; the sampled
trainer's per-batch row gather (``x[batch.node_ids]``) touches only the
sampled pages, so host memory stays bounded by the page cache
(SURVEY.md §7 "papers100M host memory").
"""

from __future__ import annotations

import numpy as np


class FeatureStore:
    """numpy-indexable view over a memory-mapped [N, F] float array.

    ``dtype`` may be ``ml_dtypes.bfloat16``: a bf16 store HALVES the
    on-disk footprint and per-gather page IO (papers100M: 57 → 28 GB) and
    is numerically free on the bf16 compute path — the model casts x to
    bf16 at entry anyway (``nn/sgformer.py:156-157``).  Gathered rows are
    returned in the STORED dtype; trainers cast per their
    ``transfer_dtype`` policy."""

    def __init__(self, path: str, shape, dtype=np.float32, mode: str = "r"):
        self.path = str(path)
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._mm = np.memmap(self.path, dtype=self.dtype, mode=mode,
                             shape=self.shape)

    @classmethod
    def create(cls, path: str, array: np.ndarray,
               dtype=np.float32) -> "FeatureStore":
        """Persist an in-memory array as a feature store (cast to
        ``dtype`` — pass ``ml_dtypes.bfloat16`` for a half-size store)."""
        array = np.ascontiguousarray(array).astype(dtype, copy=False)
        mm = np.memmap(path, dtype=array.dtype, mode="w+", shape=array.shape)
        mm[:] = array
        mm.flush()
        return cls(path, array.shape, array.dtype)

    @classmethod
    def from_npy(cls, path: str) -> "FeatureStore":
        """Open an existing .npy file without loading it (mmap_mode)."""
        arr = np.load(path, mmap_mode="r")
        store = cls.__new__(cls)
        store.path = str(path)
        store.shape = arr.shape
        store.dtype = arr.dtype
        store._mm = arr
        return store

    def __getitem__(self, idx):
        # row gather copies just the requested rows into RAM, in the
        # STORED dtype (f32 stores behave as before; bf16 stores return
        # bf16 rows).  np.take is measurably faster than fancy indexing
        # for large cold gathers (scripts/microbench_sampled_step.py).
        idx = np.asarray(idx)
        if idx.ndim == 1 and np.issubdtype(idx.dtype, np.integer):
            return np.take(self._mm, idx, axis=0)
        return np.asarray(self._mm[idx])

    def __len__(self):
        return self.shape[0]

    @property
    def ndim(self):
        return len(self.shape)
