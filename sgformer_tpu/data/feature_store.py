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
    """numpy-indexable view over a memory-mapped [N, F] float array."""

    def __init__(self, path: str, shape, dtype=np.float32, mode: str = "r"):
        self.path = str(path)
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._mm = np.memmap(self.path, dtype=self.dtype, mode=mode,
                             shape=self.shape)

    @classmethod
    def create(cls, path: str, array: np.ndarray) -> "FeatureStore":
        """Persist an in-memory array as a feature store."""
        array = np.ascontiguousarray(array, dtype=np.float32)
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
        # row gather copies just the requested rows into RAM.  np.take is
        # measurably faster than fancy indexing for large cold gathers
        # (scripts/microbench_sampled_step.py) and equal when warm.
        idx = np.asarray(idx)
        if idx.ndim == 1 and np.issubdtype(idx.dtype, np.integer):
            return np.take(self._mm, idx, axis=0).astype(
                np.float32, copy=False
            )
        return np.asarray(self._mm[idx], dtype=np.float32)

    def __len__(self):
        return self.shape[0]

    @property
    def ndim(self):
        return len(self.shape)
