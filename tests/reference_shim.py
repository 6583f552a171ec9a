"""Load the reference's own torch model code (read-only, /root/reference)
so it can be compared against this framework in-process.

The reference model files (``large/ours.py``, ``100M/ours.py``) import
exactly three third-party symbols beyond torch itself:
``torch_sparse.SparseTensor``, ``torch_sparse.matmul``, and
``torch_geometric.utils.degree`` (``large/ours.py:7-8``).  Neither package
exists in this environment (both are CUDA-built extensions), so this module
provides minimal pure-torch implementations with identical semantics and
loads the reference files UNMODIFIED via importlib.

This enables cross-IMPLEMENTATION parity tests: our JAX framework vs the
reference's actual executing code — not a re-derivation of its math (which
``tests/reference_numpy.py`` already covers).  No reference code is copied;
the files are executed in place from the read-only checkout.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _build_torch_sparse():
    import torch

    class SparseTensor:
        """Minimal stand-in for ``torch_sparse.SparseTensor``: COO triplet
        plus the sparse size — only the surface the reference model code
        touches (constructor + ``matmul``, ``large/ours.py:33-34``)."""

        def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
            self.row_idx = row
            self.col_idx = col
            self.value = value
            self._sparse_sizes = sparse_sizes

        def sparse_sizes(self):
            return self._sparse_sizes

    def matmul(adj: SparseTensor, x, reduce: str = "sum"):
        """``out[row_e] += value_e * x[col_e]`` — the semantics of
        ``torch_sparse.matmul(adj, x)`` for a COO ``adj``."""
        import torch

        if reduce != "sum":
            raise NotImplementedError(f"shim matmul reduce={reduce!r}")
        n = adj._sparse_sizes[0]
        out = torch.zeros((n,) + tuple(x.shape[1:]), dtype=x.dtype)
        msg = x[adj.col_idx.long()]
        if adj.value is not None:
            val = adj.value.to(x.dtype)
            msg = msg * val.reshape(-1, *([1] * (x.dim() - 1)))
        out.index_add_(0, adj.row_idx.long(), msg)
        return out

    mod = types.ModuleType("torch_sparse")
    mod.SparseTensor = SparseTensor
    mod.matmul = matmul
    return mod


def _build_torch_geometric():
    import torch

    def degree(index, num_nodes=None, dtype=None):
        """PyG ``torch_geometric.utils.degree``: bincount of ``index``."""
        n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
        out = torch.zeros(n, dtype=dtype if dtype is not None else torch.float32)
        one = torch.ones(index.shape[0], dtype=out.dtype)
        out.scatter_add_(0, index.long(), one)
        return out

    pkg = types.ModuleType("torch_geometric")
    utils = types.ModuleType("torch_geometric.utils")
    utils.degree = degree
    pkg.utils = utils
    return pkg, utils


def install_shims() -> None:
    """Register shim modules for the missing CUDA packages (idempotent;
    no-ops if the real packages are importable)."""
    if "torch_sparse" not in sys.modules:
        try:
            import torch_sparse  # noqa: F401
        except ImportError:
            sys.modules["torch_sparse"] = _build_torch_sparse()
    if "torch_geometric" not in sys.modules:
        try:
            import torch_geometric  # noqa: F401
        except ImportError:
            pkg, utils = _build_torch_geometric()
            sys.modules["torch_geometric"] = pkg
            sys.modules["torch_geometric.utils"] = utils


def load_reference(relpath: str, name: str):
    """Import a reference file by path with the shims installed, e.g.
    ``load_reference("large/ours.py", "ref_large_ours")``."""
    install_shims()
    path = REFERENCE_ROOT / relpath
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
