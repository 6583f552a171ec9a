"""Load the reference's own torch code (read-only, /root/reference) so it
can be compared against this framework in-process.

The reference depends on CUDA-built packages that don't exist in this
environment; this module provides pure-torch stand-ins with the same
semantics so the reference files load and run UNMODIFIED via importlib:

- ``torch_sparse``: SparseTensor (COO triplet + size, LINK/MultiLP
  conveniences), ``matmul`` (incl. batched dense operands), ``spspmm``;
- ``torch_geometric.utils``: degree, remove/add_self_loops, subgraph,
  to_undirected, to_dense_adj, k_hop_subgraph (name-only);
- ``torch_geometric.nn``: gcn_norm (add-REMAINING self-loop semantics),
  GCNConv, SGConv, APPNP, JumpingKnowledge, a minimal MessagePassing —
  implemented from the documented PyG 1.7.2 behavior the reference pins
  (``large/requirements.txt``), NOT copied from PyG.  GATConv (round 4)
  implements the 1.7.2 semantics faithfully: shared lin_l=lin_r, additive
  per-head logits, LeakyReLU, per-destination segment softmax, attention
  dropout, remove+re-add self-loops per forward;
- ``google_drive_downloader``: import-only stub (zero egress here).

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
        touches (constructor + ``matmul``, ``large/ours.py:33-34``;
        ``to_torch_sparse_coo_tensor`` for LINK, ``device`` for MultiLP)."""

        def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
            self.row_idx = row
            self.col_idx = col
            self.value = value
            self._sparse_sizes = sparse_sizes

        def sparse_sizes(self):
            return self._sparse_sizes

        def device(self):
            return self.row_idx.device

        def to_torch_sparse_coo_tensor(self):
            v = self.value
            if v is None:
                v = torch.ones(self.row_idx.shape[0])
            return torch.sparse_coo_tensor(
                torch.stack([self.row_idx.long(), self.col_idx.long()]),
                v,
                self._sparse_sizes,
            ).coalesce()

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

    def spspmm(indexA, valueA, indexB, valueB, m, k, n, coalesced=False):
        """``torch_sparse.spspmm``: sparse @ sparse → coalesced COO
        (H2GCN's A² build, ``medium/models.py:264-276``)."""
        a = torch.sparse_coo_tensor(indexA, valueA, (m, k))
        b = torch.sparse_coo_tensor(indexB, valueB, (k, n))
        c = torch.sparse.mm(a, b).coalesce()
        return c.indices(), c.values()

    mod = types.ModuleType("torch_sparse")
    mod.SparseTensor = SparseTensor
    mod.matmul = matmul
    mod.spspmm = spspmm
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

    def subgraph(subset, edge_index, edge_attr=None, relabel_nodes=False,
                 num_nodes=None):
        """PyG ``utils.subgraph``: keep edges with BOTH endpoints in
        ``subset``; optionally relabel to the subset's local ids."""
        n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
        node_mask = torch.zeros(n, dtype=torch.bool)
        node_mask[subset] = True
        emask = node_mask[edge_index[0]] & node_mask[edge_index[1]]
        ei = edge_index[:, emask]
        if relabel_nodes:
            relabel = torch.full((n,), -1, dtype=torch.long)
            relabel[subset] = torch.arange(len(subset))
            ei = relabel[ei]
        return ei, (edge_attr[emask] if edge_attr is not None else None)

    def to_undirected(edge_index, num_nodes=None):
        """PyG ``to_undirected``: symmetrize + coalesce (sorted unique)."""
        both = torch.cat([edge_index, edge_index.flip(0)], dim=1)
        n = int(num_nodes) if num_nodes is not None else int(both.max()) + 1
        key = both[0].long() * n + both[1].long()
        uniq = torch.unique(key, sorted=True)
        return torch.stack([uniq // n, uniq % n]).to(edge_index.dtype)

    def k_hop_subgraph(*a, **k):  # pragma: no cover - name-only import
        raise RuntimeError("k_hop_subgraph shim is import-only")

    def to_dense_adj(edge_index, batch=None, edge_attr=None, max_num_nodes=None):
        n = (int(max_num_nodes) if max_num_nodes is not None
             else int(edge_index.max()) + 1)
        adj = torch.zeros((n, n))
        adj[edge_index[0].long(), edge_index[1].long()] = (
            1.0 if edge_attr is None else edge_attr.float()
        )
        return adj.unsqueeze(0)

    pkg = types.ModuleType("torch_geometric")
    utils = types.ModuleType("torch_geometric.utils")
    utils.degree = degree
    utils.remove_self_loops = remove_self_loops
    utils.add_self_loops = add_self_loops
    utils.subgraph = subgraph
    utils.to_undirected = to_undirected
    utils.k_hop_subgraph = k_hop_subgraph
    utils.to_dense_adj = to_dense_adj
    pkg.utils = utils
    return pkg, utils


def _build_torch_geometric_nn(ts_mod):
    """Pure-torch stand-ins for the PyG 1.7.2 convs/utilities that
    ``large/gnns.py`` and ``medium/models.py`` import
    (``large/requirements.txt`` pins torch_geometric 1.7.2).  Implemented
    from the documented PyG semantics — ``gcn_norm`` with
    ``add_remaining_self_loops`` weight handling, GCNConv's
    weight-then-propagate-then-bias order — NOT copied from PyG (which is
    CUDA-compiled here).  ``GATConv`` is a construct-time stub: the GAT
    baselines are covered against the numpy oracle instead."""
    import math

    import torch
    import torch.nn as nn

    SparseTensor, st_matmul = ts_mod.SparseTensor, ts_mod.matmul

    def _add_remaining_self_loops(edge_index, edge_weight, fill_value, n):
        row, col = edge_index[0], edge_index[1]
        mask = row != col
        loop_weight = torch.full((n,), float(fill_value))
        inv = ~mask
        if edge_weight is not None and int(inv.sum()) > 0:
            # existing self-loop weights are PRESERVED (PyG
            # add_remaining_self_loops), not replaced by fill_value
            loop_weight[row[inv].long()] = edge_weight[inv]
        loop = torch.arange(n, dtype=edge_index.dtype).unsqueeze(0).repeat(2, 1)
        out_index = torch.cat([edge_index[:, mask], loop], dim=1)
        out_weight = torch.cat(
            [edge_weight[mask] if edge_weight is not None
             else torch.ones(int(mask.sum())), loop_weight]
        )
        return out_index, out_weight

    def gcn_norm(edge_index, edge_weight=None, num_nodes=None, improved=False,
                 add_self_loops=True, dtype=None):
        assert isinstance(edge_index, torch.Tensor), "shim: Tensor form only"
        n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
        fill = 2.0 if improved else 1.0
        if edge_weight is None:
            edge_weight = torch.ones(edge_index.shape[1])
        if add_self_loops:
            edge_index, edge_weight = _add_remaining_self_loops(
                edge_index, edge_weight, fill, n
            )
        row, col = edge_index[0].long(), edge_index[1].long()
        deg = torch.zeros(n).scatter_add_(0, col, edge_weight)
        dinv = deg.pow(-0.5)
        dinv[torch.isinf(dinv)] = 0.0
        return edge_index, dinv[row] * edge_weight * dinv[col]

    def _scatter_edges(msg, dst, n):
        out = torch.zeros((n,) + tuple(msg.shape[1:]), dtype=msg.dtype)
        out.index_add_(0, dst.long(), msg)
        return out

    class GCNConv(nn.Module):
        """PyG 1.7 GCNConv: ``x @ weight`` → weighted scatter → ``+ bias``;
        ``normalize=False`` propagates the RAW adjacency (no self-loops,
        no degree norm) — the ``save_mem=True`` quirk in gnns.py:177-182."""

        def __init__(self, in_channels, out_channels, improved=False,
                     cached=False, add_self_loops=True, normalize=True,
                     bias=True):
            super().__init__()
            self.improved = improved
            self.normalize = normalize
            self.add_self_loops = add_self_loops
            self.weight = nn.Parameter(torch.empty(in_channels, out_channels))
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
            self.reset_parameters()

        def reset_parameters(self):
            nn.init.xavier_uniform_(self.weight)  # PyG glorot
            if self.bias is not None:
                nn.init.zeros_(self.bias)

        def forward(self, x, edge_index, edge_weight=None):
            if self.normalize:
                edge_index, edge_weight = gcn_norm(
                    edge_index, edge_weight, x.shape[0], self.improved,
                    self.add_self_loops, x.dtype,
                )
            x = x @ self.weight
            msg = x[edge_index[0].long()]
            if edge_weight is not None:
                msg = msg * edge_weight.view(-1, 1)
            out = _scatter_edges(msg, edge_index[1], x.shape[0])
            if self.bias is not None:
                out = out + self.bias
            return out

    class SGConv(nn.Module):
        """PyG SGConv: K gcn_norm propagations, then one Linear."""

        def __init__(self, in_channels, out_channels, K=1, cached=False,
                     add_self_loops=True, bias=True):
            super().__init__()
            self.K = K
            self.lin = nn.Linear(in_channels, out_channels, bias=bias)

        def reset_parameters(self):
            self.lin.reset_parameters()

        def forward(self, x, edge_index, edge_weight=None):
            edge_index, edge_weight = gcn_norm(
                edge_index, edge_weight, x.shape[0], False, True, x.dtype
            )
            src, dst = edge_index[0], edge_index[1]
            for _ in range(self.K):
                x = _scatter_edges(x[src.long()] * edge_weight.view(-1, 1),
                                   dst, x.shape[0])
            return self.lin(x)

    class APPNP(nn.Module):
        """PyG APPNP: z ← (1-α)·Â z + α·h, K iterations."""

        def __init__(self, K, alpha, cached=False, add_self_loops=True,
                     normalize=True):
            super().__init__()
            self.K, self.alpha = K, alpha

        def reset_parameters(self):
            pass

        def forward(self, x, edge_index, edge_weight=None):
            edge_index, edge_weight = gcn_norm(
                edge_index, edge_weight, x.shape[0], False, True, x.dtype
            )
            src, dst = edge_index[0], edge_index[1]
            h = x
            for _ in range(self.K):
                x = _scatter_edges(x[src.long()] * edge_weight.view(-1, 1),
                                   dst, x.shape[0])
                x = x * (1 - self.alpha) + self.alpha * h
            return x

    class JumpingKnowledge(nn.Module):
        def __init__(self, mode, channels=None, num_layers=None):
            super().__init__()
            assert mode in ("cat", "max"), f"shim JK mode {mode!r}"
            self.mode = mode

        def reset_parameters(self):
            pass

        def forward(self, xs):
            if self.mode == "cat":
                return torch.cat(xs, dim=-1)
            return torch.stack(xs, dim=0).max(dim=0)[0]

    class MessagePassing(nn.Module):
        """Minimal base: 'add' aggregation, source_to_target flow, message
        kwargs resolved by the PyG suffix convention (``*_j`` gathers the
        source endpoint, ``*_i`` the destination, others pass through)."""

        def __init__(self, aggr="add", **kwargs):
            super().__init__()
            assert aggr == "add", f"shim MessagePassing aggr {aggr!r}"

        def propagate(self, edge_index, size=None, **kwargs):
            import inspect

            src, dst = edge_index[0].long(), edge_index[1].long()
            n = kwargs["x"].shape[0]
            args = []
            for name in inspect.signature(self.message).parameters:
                if name.endswith("_j"):
                    args.append(kwargs[name[:-2]][src])
                elif name.endswith("_i"):
                    args.append(kwargs[name[:-2]][dst])
                else:
                    args.append(kwargs[name])
            return _scatter_edges(self.message(*args), dst, n)

        def message(self, x_j):
            return x_j

    class GATConv(nn.Module):
        """PyG 1.7.2 GATConv from its documented semantics (not copied):
        one shared ``lin_l = lin_r`` Linear (int in_channels), per-head
        additive attention logits ``(x_l·att_l)[src] + (x_r·att_r)[dst]``
        through LeakyReLU, segment softmax per DESTINATION, dropout on the
        attention coefficients, sum aggregation, heads concatenated (or
        averaged when ``concat=False``), then bias."""

        def __init__(self, in_channels, out_channels, heads=1, concat=True,
                     negative_slope=0.2, dropout=0.0, add_self_loops=True,
                     bias=True, **kwargs):
            super().__init__()
            self.heads, self.out_channels = heads, out_channels
            self.concat, self.negative_slope = concat, negative_slope
            self.dropout = dropout
            self.add_self_loops = add_self_loops
            self.lin_l = nn.Linear(in_channels, heads * out_channels,
                                   bias=False)
            self.lin_r = self.lin_l
            self.att_l = nn.Parameter(torch.empty(1, heads, out_channels))
            self.att_r = nn.Parameter(torch.empty(1, heads, out_channels))
            if bias:
                self.bias = nn.Parameter(
                    torch.empty(heads * out_channels if concat else
                                out_channels)
                )
            else:
                self.register_parameter("bias", None)
            self.reset_parameters()

        def reset_parameters(self):
            nn.init.xavier_uniform_(self.lin_l.weight)  # PyG glorot
            nn.init.xavier_uniform_(self.att_l)
            nn.init.xavier_uniform_(self.att_r)
            if self.bias is not None:
                nn.init.zeros_(self.bias)

        def forward(self, x, edge_index):
            H, C = self.heads, self.out_channels
            n = x.shape[0]
            x_l = self.lin_l(x).view(-1, H, C)
            alpha_l = (x_l * self.att_l).sum(-1)  # [N, H]
            alpha_r = (x_l * self.att_r).sum(-1)
            src, dst = edge_index[0].long(), edge_index[1].long()
            if self.add_self_loops:
                # PyG remove_self_loops + add_self_loops at every forward
                keep = src != dst
                loop = torch.arange(n, dtype=src.dtype)
                src = torch.cat([src[keep], loop])
                dst = torch.cat([dst[keep], loop])
            e = torch.nn.functional.leaky_relu(
                alpha_l[src] + alpha_r[dst], self.negative_slope
            )  # [E, H]
            # segment softmax over incoming edges of each destination
            e_max = torch.zeros(n, H).index_reduce_(
                0, dst, e, "amax", include_self=False
            )
            ex = torch.exp(e - e_max[dst])
            denom = torch.zeros(n, H).index_add_(0, dst, ex)
            alpha = ex / denom.clamp(min=1e-16)[dst]
            alpha = torch.nn.functional.dropout(
                alpha, p=self.dropout, training=self.training
            )
            out = torch.zeros(n, H, C, dtype=x_l.dtype).index_add_(
                0, dst, x_l[src] * alpha.unsqueeze(-1)
            )
            out = out.reshape(n, H * C) if self.concat else out.mean(dim=1)
            if self.bias is not None:
                out = out + self.bias
            return out

    nn_mod = types.ModuleType("torch_geometric.nn")
    nn_mod.GCNConv = GCNConv
    nn_mod.SGConv = SGConv
    nn_mod.GATConv = GATConv
    nn_mod.APPNP = APPNP
    nn_mod.JumpingKnowledge = JumpingKnowledge
    nn_mod.MessagePassing = MessagePassing
    conv_pkg = types.ModuleType("torch_geometric.nn.conv")
    gcn_conv_mod = types.ModuleType("torch_geometric.nn.conv.gcn_conv")
    gcn_conv_mod.gcn_norm = gcn_norm
    gcn_conv_mod.GCNConv = GCNConv
    conv_pkg.gcn_conv = gcn_conv_mod
    nn_mod.conv = conv_pkg
    return nn_mod, conv_pkg, gcn_conv_mod


def _build_performer_pytorch():
    """``performer_pytorch.SelfAttention`` stand-in from the package's
    documented FAVOR+ math (softmax positive random features, orthogonal
    gaussian projection buffer, non-causal linear attention), NOT copied.
    Mirrors the defaults the reference relies on at
    ``medium/graphgps.py:27-29``: dim_head=64 regardless of dim,
    nb_features=int(dim_head*ln(dim_head)), qkv bias off, out bias on,
    eps=1e-4, projection drawn once at init and kept as a buffer."""
    import math

    import torch
    import torch.nn as nn

    def orthogonal_gaussian_matrix(nb_rows, nb_cols):
        blocks = []
        for _ in range(nb_rows // nb_cols):
            q, _ = torch.linalg.qr(torch.randn(nb_cols, nb_cols))
            blocks.append(q.t())
        rem = nb_rows - (nb_rows // nb_cols) * nb_cols
        if rem > 0:
            q, _ = torch.linalg.qr(torch.randn(nb_cols, nb_cols))
            blocks.append(q.t()[:rem])
        final = torch.cat(blocks)
        multiplier = torch.randn(nb_rows, nb_cols).norm(dim=1)
        return torch.diag(multiplier) @ final

    def softmax_kernel(data, projection, is_query, eps=1e-4):
        # data: [b, h, n, d]; projection: [m, d]
        normalizer = data.shape[-1] ** -0.25
        ratio = projection.shape[0] ** -0.5
        data_dash = torch.einsum(
            "bhnd,md->bhnm", data * normalizer, projection
        )
        diag = (data ** 2).sum(-1, keepdim=True) / 2.0 * normalizer ** 2
        if is_query:
            stab = data_dash.amax(dim=-1, keepdim=True)
        else:
            stab = data_dash.amax(dim=(-1, -2), keepdim=True)
        return ratio * (torch.exp(data_dash - diag - stab) + eps)

    class SelfAttention(nn.Module):
        def __init__(self, dim, causal=False, heads=8, dim_head=64,
                     nb_features=None, dropout=0.0, qkv_bias=False,
                     attn_out_bias=True, **kwargs):
            super().__init__()
            assert not causal, "shim covers the non-causal path only"
            self.heads, self.dim_head = heads, dim_head
            inner = heads * dim_head
            m = nb_features or int(dim_head * math.log(dim_head))
            self.to_q = nn.Linear(dim, inner, bias=qkv_bias)
            self.to_k = nn.Linear(dim, inner, bias=qkv_bias)
            self.to_v = nn.Linear(dim, inner, bias=qkv_bias)
            self.to_out = nn.Linear(inner, dim, bias=attn_out_bias)
            self.dropout = nn.Dropout(dropout)
            self.register_buffer(
                "projection_matrix", orthogonal_gaussian_matrix(m, dim_head)
            )

        def forward(self, x):
            b, n, _ = x.shape
            h, d = self.heads, self.dim_head
            q = self.to_q(x).view(b, n, h, d).transpose(1, 2)
            k = self.to_k(x).view(b, n, h, d).transpose(1, 2)
            v = self.to_v(x).view(b, n, h, d).transpose(1, 2)
            qp = softmax_kernel(q, self.projection_matrix, True)
            kp = softmax_kernel(k, self.projection_matrix, False)
            k_sum = kp.sum(dim=-2)  # [b, h, m]
            d_inv = 1.0 / torch.einsum("bhnm,bhm->bhn", qp, k_sum)
            context = torch.einsum("bhnm,bhnd->bhmd", kp, v)
            out = torch.einsum("bhmd,bhnm,bhn->bhnd", context, qp, d_inv)
            out = out.transpose(1, 2).reshape(b, n, h * d)
            return self.dropout(self.to_out(out))

    mod = types.ModuleType("performer_pytorch")
    mod.SelfAttention = SelfAttention
    return mod


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
            nn_mod, conv_pkg, gcn_conv_mod = _build_torch_geometric_nn(
                sys.modules["torch_sparse"]
            )
            pkg.nn = nn_mod
            sys.modules["torch_geometric"] = pkg
            sys.modules["torch_geometric.utils"] = utils
            sys.modules["torch_geometric.nn"] = nn_mod
            sys.modules["torch_geometric.nn.conv"] = conv_pkg
            sys.modules["torch_geometric.nn.conv.gcn_conv"] = gcn_conv_mod
    if "performer_pytorch" not in sys.modules:
        try:
            import performer_pytorch  # noqa: F401
        except ImportError:
            sys.modules["performer_pytorch"] = _build_performer_pytorch()
    if "google_drive_downloader" not in sys.modules:
        try:
            import google_drive_downloader  # noqa: F401
        except ImportError:
            gdd_mod = types.ModuleType("google_drive_downloader")

            class GoogleDriveDownloader:  # pragma: no cover - never called
                @staticmethod
                def download_file_from_google_drive(*a, **k):
                    raise RuntimeError("no network in this environment")

            gdd_mod.GoogleDriveDownloader = GoogleDriveDownloader
            sys.modules["google_drive_downloader"] = gdd_mod


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
