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
        """``out[..., row_e, :] += value_e * x[..., col_e, :]`` — the
        semantics of ``torch_sparse.matmul(adj, x)`` for a COO ``adj``.
        Like the real extension, dense ``x`` may carry leading batch dims
        (NodeFormer passes [B, N, D], ``medium/nodeformer.py:221``); the
        node dimension is ``-2`` for ndim >= 2, else ``-1``."""
        import torch

        if reduce != "sum":
            raise NotImplementedError(f"shim matmul reduce={reduce!r}")
        n = adj._sparse_sizes[0]
        dim = -2 if x.dim() >= 2 else -1
        msg = x.index_select(dim, adj.col_idx.long())
        if adj.value is not None:
            val = adj.value.to(x.dtype)
            shape = [1] * x.dim()
            shape[dim] = -1
            msg = msg * val.reshape(shape)
        out_shape = list(x.shape)
        out_shape[dim] = n
        out = torch.zeros(out_shape, dtype=x.dtype)
        out.index_add_(dim, adj.row_idx.long(), msg)
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

    def remove_self_loops(edge_index, edge_attr=None):
        mask = edge_index[0] != edge_index[1]
        return edge_index[:, mask], (
            edge_attr[mask] if edge_attr is not None else None
        )

    def add_self_loops(edge_index, edge_attr=None, num_nodes=None):
        n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
        loop = torch.arange(n, dtype=edge_index.dtype).unsqueeze(0).repeat(2, 1)
        out = torch.cat([edge_index, loop], dim=1)
        if edge_attr is not None:
            raise NotImplementedError("shim add_self_loops with edge_attr")
        return out, None

    pkg = types.ModuleType("torch_geometric")
    utils = types.ModuleType("torch_geometric.utils")
    utils.degree = degree
    utils.remove_self_loops = remove_self_loops
    utils.add_self_loops = add_self_loops
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


def load_reference(relpath: str, name: str, stub_modules: tuple = ()):
    """Import a reference file by path with the shims installed, e.g.
    ``load_reference("large/ours.py", "ref_large_ours")``.

    ``stub_modules`` registers throwaway placeholder modules for sibling
    imports the file never exercises at function level (e.g. the ablation
    files' module-level ``from models import GCN``,
    ``medium/ablation/oursSOFT.py:9`` — GCN is only referenced when a
    caller builds the full medium pipeline).  Any attribute resolves to a
    class that raises on instantiation; the stubs are removed again after
    the exec so they cannot leak into other tests."""
    install_shims()
    stubbed = []
    for sname in stub_modules:
        if sname in sys.modules:
            continue
        stub = types.ModuleType(sname)

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError(f"stubbed reference dependency: {sname}")

        stub.__getattr__ = lambda attr, _c=_Unavailable: _c
        sys.modules[sname] = stub
        stubbed.append(sname)
    try:
        path = REFERENCE_ROOT / relpath
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        for sname in stubbed:
            sys.modules.pop(sname, None)
    return mod
