"""Fused Pallas linear attention — the SGFormer O(N) kernel
(spec: ``/root/reference/medium/ours.py:14-46``) as two fused passes:

1. **reduce**: one sweep over node blocks accumulating the cross-node
   sums — kᵀv [M, D], Σk [M], ‖q‖², ‖k‖² — in VMEM (output blocks
   revisited every grid step, so the partials never round-trip HBM).
2. **apply**: one sweep computing ``out = (inv·qK + n·v) / (inv·q·Σk + n)``
   per node block with the matmul, scale, bias and divide fused into a
   single VMEM-resident epilogue.

Between the passes the reduced quantities are plain arrays, so the
node-sharded form inserts its single ``psum`` there — the same collective
structure as the XLA path (SURVEY.md §5).  Memory traffic is the
theoretical minimum: q/k/v read twice, out written once, ~2 KB of
reductions in between (the XLA path materializes several [N, D]
intermediates in the epilogue chain).

Backward is hand-derived einsums (cheap, MXU-friendly) verified against
autodiff of the jnp reference in ``tests/test_kernels.py``.  Multi-head
inputs loop the single-head kernel over heads (the reference's headline
configs all use H=1)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_rows_valid(i, block, n_rows):
    """[block, 1] bool: rows that are real (< n_rows) in grid step i.
    Only the LAST block can be partial: pallas pads boundary input blocks
    with UNSPECIFIED values (NaN in interpret mode), so padding must be
    zeroed with a select — a 0-multiply would keep NaNs."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) + i * block
    return rows < n_rows


def _zero_tail(x, valid):
    return jnp.where(valid, x, jnp.zeros_like(x))


def _reduce_kernel(q_ref, k_ref, v_ref, kvs_ref, ksum_ref, scal_ref,
                   *, n_rows):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        kvs_ref[:] = jnp.zeros_like(kvs_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)
        scal_ref[:] = jnp.zeros_like(scal_ref)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    block = q.shape[0]
    if n_rows % block:
        valid = _tail_rows_valid(i, block, n_rows)
        q, k, v = _zero_tail(q, valid), _zero_tail(k, valid), _zero_tail(v, valid)
    kvs_ref[:] += jax.lax.dot_general(
        k, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ksum_ref[:] += jnp.sum(k, axis=0, keepdims=True).astype(jnp.float32)
    qsq = jnp.sum(jnp.square(q.astype(jnp.float32)))
    ksq = jnp.sum(jnp.square(k.astype(jnp.float32)))
    pad = jnp.zeros((1, 126), dtype=jnp.float32)
    scal_ref[:] += jnp.concatenate(
        [qsq.reshape(1, 1), ksq.reshape(1, 1), pad], axis=1
    )


def _apply_kernel(n_ref, q_ref, v_ref, kvs_ref, ksum_ref, scal_ref, out_ref):
    q = q_ref[:]
    v = v_ref[:].astype(jnp.float32)
    inv = jax.lax.rsqrt(scal_ref[0, 0]) * jax.lax.rsqrt(scal_ref[0, 1])
    n = n_ref[0, 0]
    # MXU needs matching operand dtypes; accumulate in f32 regardless
    a = jax.lax.dot_general(
        q, kvs_ref[:].astype(q.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # matvec as a VPU multiply-reduce (a [B,M]x[1,M] dot miscompiles for
    # bf16 operands in mosaic)
    b = jnp.sum(
        q.astype(jnp.float32) * ksum_ref[:].astype(jnp.float32),
        axis=1, keepdims=True,
    )  # [B, 1]
    num = inv * a + n * v
    den = inv * b + n
    out_ref[:] = (num / den).astype(out_ref.dtype)


def _reduce(q, k, v, block, interpret):
    """Local partial sums (kvs [M,D], ksum [1,M], [qsq ksq]).

    NO host-side padding: the grid ceil-divides N and the kernel masks the
    tail block in VMEM — the old ``jnp.pad`` path copied every [N, M]
    operand (and the backward repeated it), which at the arxiv shape cost
    more than the kernel's whole compute."""
    M, D = q.shape[1], v.shape[1]
    grid = -(-q.shape[0] // block)
    return pl.pallas_call(
        partial(_reduce_kernel, n_rows=q.shape[0]),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _apply(q, v, kvs, ksum, scal, n_total, block, interpret):
    """Out rows of a partial tail block are computed on unspecified pad
    inputs and CLIPPED by the bounded store — no masking needed (den >= n
    keeps the divide finite on real rows; pad rows never land)."""
    N, M = q.shape
    D = v.shape[1]
    grid = -(-N // block)
    n_arr = jnp.asarray(n_total, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        _apply_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), q.dtype),
        interpret=interpret,
    )(n_arr, q, v, kvs, ksum, scal)


def _fwd_single_head(q, k, v, n_total, axis_name, block, interpret):
    kvs, ksum, scal = _reduce(q, k, v, block, interpret)
    if axis_name is not None:
        kvs, ksum, scal = jax.lax.psum((kvs, ksum, scal), axis_name)
    return _apply(q, v, kvs, ksum, scal, n_total, block, interpret), (
        kvs, ksum, scal,
    )


def _bwd_reduce_kernel(n_ref, q_ref, v_ref, g_ref, kvs_ref, ksum_ref,
                       scal_ref, P_ref, ds_ref, extra_ref, *, n_rows):
    """Backward pass 1: accumulate the cross-node partials
    P = Σ qᵢ⊗gdᵢ, ds = Σ qᵢ·gdenᵢ, dinv = Σ gd·a + gden·b, recomputing
    den/num per block IN VMEM (no [N,*] f32 temp ever hits HBM — the old
    einsum backward materialized four of them)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        P_ref[:] = jnp.zeros_like(P_ref)
        ds_ref[:] = jnp.zeros_like(ds_ref)
        extra_ref[:] = jnp.zeros_like(extra_ref)

    inv = jax.lax.rsqrt(scal_ref[0, 0]) * jax.lax.rsqrt(scal_ref[0, 1])
    n = n_ref[0, 0]
    q = q_ref[:]
    vf = v_ref[:].astype(jnp.float32)
    gf = g_ref[:].astype(jnp.float32)
    if n_rows % q.shape[0]:
        # tail block: pallas pads boundary inputs with unspecified values
        # (NaN in interpret mode) — select-zero them so den/num/gd stay
        # finite and the reductions are exact
        valid = _tail_rows_valid(i, q.shape[0], n_rows)
        q = _zero_tail(q, valid)
        vf = _zero_tail(vf, valid)
        gf = _zero_tail(gf, valid)
    a = jax.lax.dot_general(
        q, kvs_ref[:].astype(q.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, D]
    qf = q.astype(jnp.float32)
    b = jnp.sum(qf * ksum_ref[:].astype(jnp.float32), axis=1,
                keepdims=True)  # [B, 1]
    den = inv * b + n
    num = inv * a + n * vf
    gd = gf / den
    gden = -jnp.sum(gf * num, axis=1, keepdims=True) / (den * den)  # [B,1]
    P_ref[:] += jax.lax.dot_general(
        qf, gd, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_ref[:] += jnp.sum(qf * gden, axis=0, keepdims=True)
    dinv = jnp.sum(gd * a) + jnp.sum(gden * b)
    pad = jnp.zeros((1, 127), dtype=jnp.float32)
    extra_ref[:] += jnp.concatenate([dinv.reshape(1, 1), pad], axis=1)


def _bwd_apply_kernel(n_ref, q_ref, k_ref, v_ref, g_ref, kvs_ref, ksum_ref,
                      scal_ref, P_ref, ds_ref, extra_ref,
                      dq_ref, dk_ref, dv_ref):
    """Backward pass 2: per-block dq/dk/dv from the reduced partials."""
    qsq, ksq = scal_ref[0, 0], scal_ref[0, 1]
    inv = jax.lax.rsqrt(qsq) * jax.lax.rsqrt(ksq)
    n = n_ref[0, 0]
    dinv = extra_ref[0, 0]
    q = q_ref[:]
    k = k_ref[:]
    vf = v_ref[:].astype(jnp.float32)
    gf = g_ref[:].astype(jnp.float32)
    a = jax.lax.dot_general(
        q, kvs_ref[:].astype(q.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    ksum = ksum_ref[:].astype(jnp.float32)  # [1, M]
    b = jnp.sum(qf * ksum, axis=1, keepdims=True)
    den = inv * b + n
    num = inv * a + n * vf
    gd = gf / den
    gden = -jnp.sum(gf * num, axis=1, keepdims=True) / (den * den)
    # dq = inv·(gd @ kvsᵀ) + inv·gden·ksum − dinv·inv/qsq·q
    dq = inv * jax.lax.dot_general(
        gd.astype(q.dtype), kvs_ref[:].astype(q.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dq = dq + inv * gden * ksum - (dinv * inv / qsq) * qf
    # dk = inv·(v @ Pᵀ) + inv·ds − dinv·inv/ksq·k
    dk = inv * jax.lax.dot_general(
        vf.astype(k.dtype), P_ref[:].astype(k.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dk = dk + inv * ds_ref[:].astype(jnp.float32) - (dinv * inv / ksq) * kf
    # dv = n·gd + inv·(k @ P)
    dv = n * gd + inv * jax.lax.dot_general(
        kf.astype(k.dtype), P_ref[:].astype(k.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _bwd_single_head(q, k, v, n_total, axis_name, res, g, block, interpret):
    """Fused-pallas VJP: pass 1 reduces (P, ds, dinv) with den/num
    recomputed in VMEM; one psum under sharding; pass 2 applies.  Exact
    same math as the einsum derivation it replaces (verified vs autodiff
    in tests/test_kernels.py)."""
    kvs, ksum, scal = res
    M, D = q.shape[1], v.shape[1]
    N = q.shape[0]
    # the bwd passes stream 4 node-blocked operands + 3 outputs plus
    # several f32 VMEM temporaries per block — a quarter of the fwd block
    # keeps the scoped VMEM under the 16 MB limit (block 2048 overflows
    # by 0.6 MB on the bwd apply pass)
    block = max(block // 4, 512)
    grid = -(-N // block)
    n_arr = jnp.asarray(n_total, jnp.float32).reshape(1, 1)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    P, ds, extra = pl.pallas_call(
        partial(_bwd_reduce_kernel, n_rows=N),
        grid=(grid,),
        in_specs=[
            smem,
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        interpret=interpret,
    )(n_arr, q, v, g, kvs, ksum, scal)
    if axis_name is not None:
        P, ds, extra = jax.lax.psum((P, ds, extra), axis_name)
    dq, dk, dv = pl.pallas_call(
        _bwd_apply_kernel,
        grid=(grid,),
        in_specs=[
            smem,
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            pl.BlockSpec((M, D), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, M), lambda i: (i, 0)),
            pl.BlockSpec((block, D), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, M), q.dtype),
            jax.ShapeDtypeStruct((N, M), k.dtype),
            jax.ShapeDtypeStruct((N, D), v.dtype),
        ],
        interpret=interpret,
    )(n_arr, q, k, v, g, kvs, ksum, scal, P, ds, extra)
    return dq, dk, dv


def fused_linear_attention(
    qs: jax.Array,
    ks: jax.Array,
    vs: jax.Array,
    *,
    node_mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    block: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for :func:`sgformer_tpu.ops.attention.linear_attention`
    (no ``output_attn`` — use the XLA path to materialize maps).
    qs/ks/vs: [N, H, M]; returns [N, H, D]."""
    if block is None:
        # each pass's double-buffered node-blocked operands + f32 VMEM
        # temporaries must fit the ~16 MB scoped-VMEM limit INSIDE a full
        # train step (block 4096 fits standalone but overflows by 0.7 MB
        # embedded in the jitted step; 2048 costs ~0.05 ms standalone)
        block = 2048 if qs.dtype == jnp.bfloat16 else 1024
    if node_mask is not None:
        m = node_mask.astype(qs.dtype)[:, None, None]
        qs, ks, vs = qs * m, ks * m, vs * m
        n_local = jnp.sum(node_mask.astype(jnp.float32))
    else:
        n_local = jnp.asarray(qs.shape[0], jnp.float32)
    if axis_name is not None:
        n_total = jax.lax.psum(n_local, axis_name)
    else:
        n_total = n_local

    return _attn_core(axis_name, block, interpret, qs, ks, vs, n_total)


# Module-level custom_vjp (closures over traced values leak under
# re-tracing transforms like nn.remat); statics via nondiff_argnums.
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _attn_core(axis_name, block, interpret, qs, ks, vs, n_total):
    H = qs.shape[1]
    outs = []
    for h in range(H):
        out, _ = _fwd_single_head(
            qs[:, h], ks[:, h], vs[:, h], n_total, axis_name, block, interpret
        )
        outs.append(out)
    return jnp.stack(outs, axis=1)


def _attn_core_fwd(axis_name, block, interpret, qs, ks, vs, n_total):
    H = qs.shape[1]
    outs, residuals = [], []
    for h in range(H):
        out, res = _fwd_single_head(
            qs[:, h], ks[:, h], vs[:, h], n_total, axis_name, block, interpret
        )
        outs.append(out)
        residuals.append(res)
    return jnp.stack(outs, axis=1), (qs, ks, vs, n_total, residuals)


def _attn_core_bwd(axis_name, block, interpret, saved, g):
    qs, ks, vs, n_total, residuals = saved
    H = qs.shape[1]
    dqs, dks, dvs = [], [], []
    for h in range(H):
        dq, dk, dv = _bwd_single_head(
            qs[:, h], ks[:, h], vs[:, h], n_total, axis_name,
            residuals[h], g[:, h], block, interpret,
        )
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    return (
        jnp.stack(dqs, axis=1),
        jnp.stack(dks, axis=1),
        jnp.stack(dvs, axis=1),
        jnp.zeros_like(n_total),
    )


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)
