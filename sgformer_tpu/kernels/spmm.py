"""MXU-native SpMM: one-hot matmul accumulation over edge chunks.

Replaces the scatter-add formulation of ``A_norm @ X`` (and its CUDA
ancestor, the cuSPARSE CSR SpMM behind ``torch_sparse.matmul`` at
``/root/reference/large/ours.py:33-34``) with a TPU-first algorithm:

1. XLA gathers the source rows for each edge chunk and folds in the edge
   weight: ``msgs[c] = x[gather_idx[c]] * w[c]`` (one fused pass; the only
   irregular memory access in the op).
2. A Pallas kernel walks the chunks in window order.  For each chunk it
   builds the [C, W] one-hot destination selector **in VMEM** (a VPU
   compare against an iota — never materialized to HBM) and accumulates
   ``selectorᵀ @ msgs`` into the window's [W, F] output block with one MXU
   matmul, revisiting the same output block for all chunks of a window.

The scatter therefore runs on the systolic array at matmul speed instead
of a serialized scatter-add, and the [E, F] message tensor is read exactly
once.  Backward is the same kernel on the transpose plan (dx = Aᵀ @ g);
edge weights are graph constants, so no weight cotangent is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgformer_tpu.kernels.chunks import ChunkedSpMM, ChunkPlan


def _spmm_kernel(wid_ref, dst_ref, w_ref, msgs_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    prev = wid_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, wid_ref[i] != prev)
    n = pl.num_programs(0)
    nxt = wid_ref[jnp.minimum(i + 1, n - 1)]
    is_last = jnp.logical_or(i == n - 1, nxt != wid_ref[i])

    dst = dst_ref[0]  # [1, C] window-local destination rows
    C = dst.shape[1]
    W = out_ref.shape[0]
    # [W, C] weighted selector built in registers/VMEM: row r holds w[e] at
    # the edges whose local destination is r.  Never touches HBM, and folds
    # the edge-weight multiply into the matmul for free.
    sel = jnp.broadcast_to(dst, (W, C)) == jax.lax.broadcasted_iota(
        jnp.int32, (W, C), 0
    )
    onehot = jnp.where(sel, jnp.broadcast_to(w_ref[0], (W, C)), 0.0).astype(
        msgs_ref.dtype
    )
    # f32 inputs demand the 3-pass MXU mode for true f32 products; bf16
    # inputs take the native single-pass path.
    precision = (
        jax.lax.Precision.HIGHEST
        if msgs_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    acc = jnp.dot(
        onehot, msgs_ref[0], preferred_element_type=jnp.float32,
        precision=precision,
    )

    # Accumulate in a persistent f32 VMEM scratch and write the output
    # block ONCE per window in its own (possibly bf16) dtype: the output
    # RMW traffic (one [W, F] read + write per window) halves on the bf16
    # path, and accumulation precision is unchanged.
    @pl.when(is_first)
    def _():
        acc_ref[:] = acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] = acc_ref[:] + acc

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _apply_plan(x, plan: ChunkPlan, compute_dtype, interpret: bool,
                out_dtype=jnp.float32):
    if plan.stream_shape is not None:
        return _apply_plan_streamed(x, plan, compute_dtype, interpret,
                                    out_dtype)
    return _apply_plan_single(x, plan, compute_dtype, interpret,
                              out_dtype=out_dtype)


def _apply_plan_streamed(x, plan: ChunkPlan, compute_dtype, interpret: bool,
                         out_dtype=jnp.float32):
    """Stream a restacked [nseg, S_max, C] plan (``ChunkPlan.stream_shape``)
    through ONE ``lax.scan``: every segment covers the same window span V,
    so the body (gather + pallas_call) traces once and the stacked
    [nseg, V·W, F] outputs reshape into the flat result.  Bounds the [E, F]
    message buffer to ~S_max·C·F regardless of total edge count, and —
    unlike the previous concatenate-of-segments form — compiles in O(1)
    in the segment count (the unrolled form took >30 min at 1M nodes
    through the remote-compile relay)."""
    import dataclasses as _dc

    nseg, s_max, V = plan.stream_shape
    W = plan.window_rows
    F = x.shape[1]

    def body(carry, seg):
        g, ld, wt, wid = seg
        sub = _dc.replace(
            plan,
            gather_idx=g,
            local_dst=ld,
            weight=wt,
            window_id=wid,
            num_rows_out=V * W,
            num_chunks=s_max,
            stream_shape=None,
        )
        return carry, _apply_plan_single(x, sub, compute_dtype, interpret,
                                         out_dtype=out_dtype)

    _, ys = jax.lax.scan(
        body, None,
        (plan.gather_idx, plan.local_dst, plan.weight, plan.window_id),
    )
    # trailing rows past num_rows_out are the last segment's ceil-div window
    # overhang: no chunks target them, so they are UNINITIALIZED — slice
    # them off here (callers pad with real zeros when they need more rows)
    return ys.reshape(nseg * V * W, F)[: plan.num_rows_out]


def _apply_plan_single(
    x, plan: ChunkPlan, compute_dtype, interpret: bool, weights=None,
    out_dtype=jnp.float32,
):
    C, W = plan.chunk_edges, plan.window_rows
    F = x.shape[1]
    # Cast BEFORE the gather so the irregular access and the materialized
    # [E, F] message tensor move half the bytes; the edge-weight multiply
    # happens inside the kernel (folded into the selector matmul).
    # promise_in_bounds: plan indices are host-built node ids (pad slots
    # carry index 0, weight 0), so the fill-mode out-of-bounds select —
    # a full extra RMW over the [E, F] message buffer — is skipped.
    msgs = x.astype(compute_dtype).at[plan.gather_idx.reshape(-1)].get(
        mode="promise_in_bounds")
    msgs = msgs.reshape(plan.num_chunks, C, F)
    assert C % 128 == 0, "chunk_edges must be a multiple of 128"
    # [n_chunks, 1, C]: the (1, C) trailing block shape matches the array's
    # own trailing dims, satisfying the TPU block-tiling rule for int32.
    local_dst = plan.local_dst.reshape(plan.num_chunks, 1, C)
    weight = (plan.weight if weights is None else weights).reshape(
        plan.num_chunks, 1, C
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.num_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda i, wid: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, wid: (i, 0, 0)),
            pl.BlockSpec((1, C, F), lambda i, wid: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda i, wid: (wid[i], 0)),
        scratch_shapes=[pltpu.VMEM((W, F), jnp.float32)],
    )
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_rows_out, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_chunks * C * W * F,
            bytes_accessed=(
                plan.num_chunks * C * F * msgs.dtype.itemsize
                + plan.num_rows_out * F * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.window_id, local_dst, weight, msgs)
    return out


def _zero_cotangent(tree):
    """Symbolic-zero cotangents for a pytree of aux arrays: float0 for
    integer leaves, real zeros for float leaves (custom_vjp convention)."""
    import numpy as np

    def one(leaf):
        if leaf is None:
            return None
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)

    return jax.tree_util.tree_map(one, tree)


# Module-level custom_vjp with the plan as a PYTREE ARGUMENT (not a
# closure): per-call closures capture tracers and leak under re-tracing
# transforms like jax.checkpoint/nn.remat.
@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_core(compute_dtype_name: str, interpret: bool, x, plan):
    dtype = jnp.float32 if compute_dtype_name == "float32" else jnp.bfloat16
    # emit in x's dtype directly when it matches compute (halves the out
    # write + skips the cast); mixed f32-x/bf16-msgs keeps the f32 out
    out_dt = dtype if x.dtype == dtype else jnp.float32
    return _apply_plan(
        x, plan.fwd, dtype, interpret, out_dtype=out_dt
    )[: plan.rows_fwd].astype(x.dtype)


def _spmm_core_fwd(compute_dtype_name, interpret, x, plan):
    return _spmm_core(compute_dtype_name, interpret, x, plan), plan


def _spmm_core_bwd(compute_dtype_name, interpret, plan, g):
    dtype = jnp.float32 if compute_dtype_name == "float32" else jnp.bfloat16
    # x and the forward output share a dtype, so g.dtype is x.dtype
    out_dt = dtype if g.dtype == dtype else jnp.float32
    dx = _apply_plan(
        g, plan.bwd, dtype, interpret, out_dtype=out_dt
    )[: plan.rows_bwd].astype(g.dtype)
    return dx, _zero_cotangent(plan)


_spmm_core.defvjp(_spmm_core_fwd, _spmm_core_bwd)


def chunked_spmm(
    x: jax.Array,
    plan: ChunkedSpMM,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """out[i] = Σ_{e: dst[e]==i} w[e]·x[src[e]]  — differentiable in x.

    ``compute_dtype`` is the message/matmul dtype (accumulation is always
    f32); pass ``jnp.float32`` for bit-level parity testing.
    """
    return _spmm_core(jnp.dtype(compute_dtype).name, interpret, x, plan)


def _slot_values(edge_values, perm):
    """Scatter original-order per-edge values into the [nc, C] slot layout
    (padding slots → 0)."""
    v = edge_values.at[jnp.clip(perm, 0, None).reshape(-1)].get(
        mode="promise_in_bounds")
    return (v * (perm.reshape(-1) >= 0)).astype(jnp.float32)


def chunked_spmm_edge_values(
    x: jax.Array,
    plan: ChunkedSpMM,
    edge_values: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """out[i] = Σ_{e: dst[e]==i} v_e · x[src[e]] with RUNTIME per-edge
    values (GAT attention weights) — differentiable in both ``x`` and
    ``edge_values``.  ``edge_values`` follows the graph's original
    dst-sorted edge order; the plans must be built with ``with_perm=True``.
    d(edge_values) is the SDDMM ``g[dst]·x[src]`` (the same math PyG's
    GATConv backward does via torch_scatter)."""
    assert plan.fwd.edge_perm is not None, (
        "build_chunks(..., with_perm=True) required for runtime edge values"
    )
    return _spmm_ev_core(
        jnp.dtype(compute_dtype).name, interpret, x, edge_values, plan,
        edge_src, edge_dst,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_ev_core(compute_dtype_name, interpret, x, ev, plan, edge_src, edge_dst):
    dtype = jnp.float32 if compute_dtype_name == "float32" else jnp.bfloat16
    wf = _slot_values(ev, plan.fwd.edge_perm)
    return _apply_plan_single(
        x, plan.fwd, dtype, interpret, weights=wf
    )[: plan.rows_fwd].astype(x.dtype)


def _spmm_ev_fwd(compute_dtype_name, interpret, x, ev, plan, edge_src, edge_dst):
    out = _spmm_ev_core(
        compute_dtype_name, interpret, x, ev, plan, edge_src, edge_dst
    )
    return out, (x, ev, plan, edge_src, edge_dst)


def _spmm_ev_bwd(compute_dtype_name, interpret, res, g):
    x, ev, plan, edge_src, edge_dst = res
    dtype = jnp.float32 if compute_dtype_name == "float32" else jnp.bfloat16
    wb = _slot_values(ev, plan.bwd.edge_perm)
    dx = _apply_plan_single(
        g, plan.bwd, dtype, interpret, weights=wb
    )[: plan.rows_bwd].astype(x.dtype)
    gd = g.astype(jnp.float32).at[edge_dst].get(mode="promise_in_bounds")
    xs = x.astype(jnp.float32).at[edge_src].get(mode="promise_in_bounds")
    dv = jnp.sum(gd * xs, axis=-1).astype(ev.dtype)
    return (
        dx,
        dv,
        _zero_cotangent(plan),
        _zero_cotangent(edge_src),
        _zero_cotangent(edge_dst),
    )


_spmm_ev_core.defvjp(_spmm_ev_fwd, _spmm_ev_bwd)
