"""Slab SpMM kernel: gather-free ``A_norm @ X`` for clustered graphs.

Per grid step (one output window of W rows, its slab VMEM-resident):

  for each of Q chunks (C local edges of one B-row sub-block):
    sel_src[C, B] = weighted one-hot of src-within-sub-block   (VPU)
    msgs[C, F]    = sel_src @ slab[sub*B : sub*B+B]            (MXU)
    sel_dst[W, C] = one-hot of dst-within-window               (VPU)
    acc[W, F]    += sel_dst @ msgs                             (MXU)

The slab ([B_slab, F] block of x) is fetched once per slab (consecutive
windows share it — the index map repeats, so the pallas pipeline does not
re-copy), every other operand is metadata — no [E, F] message tensor,
and NO per-edge HBM gather (the wall measured at ~7.5 ns/row in
scripts/microbench_gather.py).  Cross-slab edges run the round-1
gather+selector kernel (``kernels/spmm.py``); self-loops are a plain
``w_self ⊙ x`` elementwise.  Replaces ``torch_sparse.matmul``
(``/root/reference/large/ours.py:33-34``) on the TPU-native side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgformer_tpu.kernels.slabs import SlabPlanSide, SlabSpMM
from sgformer_tpu.kernels.spmm import _apply_plan, _zero_cotangent


def _slab_kernel(
    win_ref, slab_ref,  # scalar prefetch: [n_steps] window / slab ids
    sub_ref, meta_ref, prev_ref, x_any, out_ref,
    slab_scratch, acc_scratch, dma_sem,
    *, Q, C, B, W, R, H, compute_dtype,
):
    i = pl.program_id(0)
    prev_w = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev_w)
    n = pl.num_programs(0)
    nxt_w = win_ref[jnp.minimum(i + 1, n - 1)]
    is_last = jnp.logical_or(i == n - 1, nxt_w != win_ref[i])
    prev_s = slab_ref[jnp.maximum(i - 1, 0)]
    new_slab = jnp.logical_or(i == 0, slab_ref[i] != prev_s)

    # The slab lives in a SINGLE manually-DMA'd VMEM scratch (slab changes
    # are rare — one blocking ~15 µs copy per slab — so skipping the block
    # pipeline's double buffering halves the VMEM footprint and admits
    # 3x bigger slabs = more local edges).
    @pl.when(new_slab)
    def _():
        dma = pltpu.make_async_copy(
            x_any.at[pl.ds(pl.multiple_of(slab_ref[i] * H, H), R), :],
            slab_scratch,
            dma_sem,
        )
        dma.start()
        dma.wait()

    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # ONE packed metadata stream [3Q, C] int32 (lsrc | ldst | bitcast w):
    # three separate block pipelines cost ~3x the per-step DMA bookkeeping
    mv = meta_ref[0]  # [3Q, C] int32 — slot indices/weights live in LANES
    msgs_all = []
    sel_all = []
    for q in range(Q):
        sub = sub_ref[0, 0, q]  # SMEM scalar: sub-block within slab
        lsrc = jax.lax.slice(mv, (q, 0), (q + 1, C))  # [1, C]
        ldst = jax.lax.slice(mv, (Q + q, 0), (Q + q + 1, C))
        w = jax.lax.bitcast_convert_type(
            jax.lax.slice(mv, (2 * Q + q, 0), (2 * Q + q + 1, C)),
            jnp.float32,
        )
        # TRANSPOSED weighted src one-hot [B, C]: column c holds w[c] at
        # row lsrc[c] (indices broadcast along sublanes, the layout the
        # VPU compare supports); the MXU contracts over B directly.
        sel_src_t = jnp.where(
            jnp.broadcast_to(lsrc, (B, C))
            == jax.lax.broadcasted_iota(jnp.int32, (B, C), 0),
            jnp.broadcast_to(w, (B, C)),
            0.0,
        ).astype(compute_dtype)
        blk = slab_scratch[pl.ds(pl.multiple_of(sub * B, B), B), :]
        msgs_all.append(jax.lax.dot_general(
            sel_src_t, blk.astype(compute_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(compute_dtype))  # [C, F]
        # dst one-hot [W, C]: row r holds 1 where ldst[c] == r
        sel_all.append(jnp.where(
            jnp.broadcast_to(ldst, (W, C))
            == jax.lax.broadcasted_iota(jnp.int32, (W, C), 0),
            1.0,
            0.0,
        ).astype(compute_dtype))
    # ONE [W, Q·C] x [Q·C, F] dst matmul per step: K = Q·C keeps the MXU's
    # 128-deep contraction pipeline full even at small per-chunk C (the
    # per-chunk form pays the pipeline fill Q times with K = C).
    acc = jax.lax.dot_general(
        jnp.concatenate(sel_all, axis=1),
        jnp.concatenate(msgs_all, axis=0),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    # Persistent f32 accumulation; the single per-window output write
    # folds in ``prev`` (the remote-path partial) — the separate
    # local+remote add pass and its extra HBM round-trip disappear.
    @pl.when(is_first)
    def _():
        acc_scratch[:] = acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_scratch[:] = acc_scratch[:] + acc

    @pl.when(is_last)
    def _():
        out_ref[:] = (
            acc_scratch[:] + prev_ref[:].astype(jnp.float32)
        ).astype(out_ref.dtype)


def _ssel_kernel(
    win_ref, slab_ref,  # scalar prefetch: [n_steps] window / slab ids
    sub_ref, ssrc_ref, sdst_ref, prev_ref, x_any, *rest,
    Q, C, B, W, R, H, HUB, compute_dtype,
):
    """Streamed-selector variant: the src/dst one-hot selectors arrive
    prebuilt from HBM (``SlabPlanSide.sel_src``/``sel_dst``), so the VPU
    does no selector construction — the step is Q sub-block MXU matmuls
    into ``msgs_scratch`` plus one [W, Q·C] x [Q·C, F] scatter matmul.
    Accumulation lives in a persistent f32 VMEM scratch; the output block
    (prev + acc, in the — possibly bf16 — output dtype) is written ONCE on
    the window's last step, halving the bf16 path's out/prev RMW HBM
    traffic.  With ``HUB`` > 0 a [HUB, F] hub block (the pre-gathered
    top remote sources, power-law mode) is DMA'd ONCE at step 0 into the
    scratch tail; hub chunks address sub-blocks >= R//B."""
    if HUB:
        (hub_any, out_ref, slab_scratch, msgs_scratch, acc_scratch,
         dma_sem, hub_sem) = rest
    else:
        out_ref, slab_scratch, msgs_scratch, acc_scratch, dma_sem = rest
    i = pl.program_id(0)
    prev_w = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev_w)
    n = pl.num_programs(0)
    nxt_w = win_ref[jnp.minimum(i + 1, n - 1)]
    is_last = jnp.logical_or(i == n - 1, nxt_w != win_ref[i])
    prev_s = slab_ref[jnp.maximum(i - 1, 0)]
    new_slab = jnp.logical_or(i == 0, slab_ref[i] != prev_s)

    if HUB:
        @pl.when(i == 0)
        def _():
            dma = pltpu.make_async_copy(
                hub_any, slab_scratch.at[pl.ds(R, HUB), :], hub_sem
            )
            dma.start()
            dma.wait()

    @pl.when(new_slab)
    def _():
        dma = pltpu.make_async_copy(
            x_any.at[pl.ds(pl.multiple_of(slab_ref[i] * H, H), R), :],
            slab_scratch.at[pl.ds(0, R), :],
            dma_sem,
        )
        dma.start()
        dma.wait()

    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    slab_int8 = slab_scratch.dtype == jnp.int8
    ssrc = ssrc_ref[0]  # [Q·C, B] weighted (bf16) or 0/1 (int8) src one-hot
    if jnp.issubdtype(ssrc.dtype, jnp.integer) and not slab_int8:
        # sep mode: one whole-block int8 -> compute-dtype convert per step
        # (per-q i8 slices would be 32-sublane misaligned at C=16)
        ssrc = ssrc.astype(compute_dtype)
    for q in range(Q):
        sub = sub_ref[0, 0, q]  # SMEM scalar: sub-block within slab
        blk = slab_scratch[pl.ds(pl.multiple_of(sub * B, B), B), :]
        if slab_int8:
            # int8 x int8 -> int32 on the MXU (0/1 selectors, quantized
            # rows; exact integer accumulation, probed bit-exact on v5e)
            m = jax.lax.dot_general(
                ssrc[q * C:(q + 1) * C, :], blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [C, F] i32
        else:
            m = jax.lax.dot_general(
                ssrc[q * C:(q + 1) * C, :].astype(compute_dtype),
                blk.astype(compute_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [C, F] f32
        msgs_scratch[q * C:(q + 1) * C, :] = m.astype(compute_dtype)
    acc = jax.lax.dot_general(
        sdst_ref[0].astype(compute_dtype), msgs_scratch[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [W, F] f32

    @pl.when(is_first)
    def _():
        acc_scratch[:] = acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_scratch[:] = acc_scratch[:] + acc

    @pl.when(is_last)
    def _():
        out_ref[:] = (
            acc_scratch[:] + prev_ref[:].astype(jnp.float32)
        ).astype(out_ref.dtype)


def _apply_local_ssel(x_pad, prev, side: SlabPlanSide, compute_dtype,
                      interpret, hub_x=None):
    W, B, C, Q = (
        side.window_rows, side.block_rows, side.chunk_edges,
        side.chunks_per_step,
    )
    F = x_pad.shape[1]
    R, H = side.slab_rows, side.base_rows
    HUB = side.hub_rows if hub_x is not None else 0
    if compute_dtype == jnp.float32 and side.sel_src.dtype != jnp.float32:
        raise ValueError(
            "f32 slab_spmm on a bf16 selector stream would silently round "
            "edge weights: build the plan with stream_sel='f32'"
        )
    in_specs = [
        pl.BlockSpec(
            (1, 1, Q), lambda i, win, slab: (i, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec((1, Q * C, B), lambda i, win, slab: (i, 0, 0)),
        pl.BlockSpec((1, W, Q * C), lambda i, win, slab: (i, 0, 0)),
        pl.BlockSpec((W, F), lambda i, win, slab: (win[i], 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
    ]
    operands = [side.window_id, side.slab_id, side.subblock, side.sel_src,
                side.sel_dst, prev, x_pad]
    scratch_shapes = [
        pltpu.VMEM((R + HUB, F), x_pad.dtype),
        pltpu.VMEM((Q * C, F), compute_dtype),
        pltpu.VMEM((W, F), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if HUB:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # hub block
        operands.append(hub_x)
        scratch_shapes.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # window_id, slab_id
        grid=(side.n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((W, F), lambda i, win, slab: (win[i], 0)),
        scratch_shapes=scratch_shapes,
    )
    kernel = partial(
        _ssel_kernel, Q=Q, C=C, B=B, W=W, R=R, H=H, HUB=HUB,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((side.num_rows_out, F), prev.dtype),
        # ``prev`` aliases the output: windows with no local chunks emit NO
        # grid step (plan skips them) and their rows pass through untouched
        # — ~20% fewer steps on the bench graph than writing every window
        input_output_aliases={5: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * side.n_steps * Q * C * F * (B + W),
            bytes_accessed=(
                side.sel_src.size * side.sel_src.dtype.itemsize
                + side.sel_dst.size * side.sel_dst.dtype.itemsize
                + side.num_rows_out * F * x_pad.dtype.itemsize
                + side.num_rows_out * F * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _apply_local(x_pad, prev, side: SlabPlanSide, compute_dtype, interpret,
                 hub_x=None):
    """Local (intra-slab) edges accumulated ON TOP of ``prev`` (the
    remote partial, or zeros): [num_rows_out, F] f32."""
    if side.meta is None:
        return _apply_local_ssel(x_pad, prev, side, compute_dtype,
                                 interpret, hub_x=hub_x)
    W, B, C, Q = (
        side.window_rows, side.block_rows, side.chunk_edges,
        side.chunks_per_step,
    )
    F = x_pad.shape[1]
    R, H = side.slab_rows, side.base_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # window_id, slab_id
        grid=(side.n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, Q), lambda i, win, slab: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 3 * Q, C), lambda i, win, slab: (i, 0, 0)),
            pl.BlockSpec((W, F), lambda i, win, slab: (win[i], 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((W, F), lambda i, win, slab: (win[i], 0)),
        scratch_shapes=[
            pltpu.VMEM((R, F), x_pad.dtype),
            pltpu.VMEM((W, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = partial(
        _slab_kernel, Q=Q, C=C, B=B, W=W, R=R, H=H,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((side.num_rows_out, F), prev.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * side.n_steps * Q * C * F * (B + W),
            bytes_accessed=(
                side.num_rows_out * F * x_pad.dtype.itemsize
                + side.num_rows_out * F * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(side.window_id, side.slab_id, side.subblock, side.meta, prev, x_pad)


def _apply_side(x, plan: SlabSpMM, side: SlabPlanSide, compute_dtype,
                interpret):
    int8_slab = plan.slab_dtype == "int8"
    f_true = x.shape[1]
    if int8_slab and x.shape[1] % 128 != 0:
        # compiled-path constraint: Mosaic int8 VMEM slices are
        # (8,128)-tiled with (4,1) packing (found on-chip, BENCH.md).
        # Pad the feature dim up internally (zero columns aggregate to
        # zero and are sliced off below) so 'auto'-selected int8 plans
        # work with any hidden size — padding costs lanes but the mode is
        # only auto-picked where it wins ~12% (round-4 VERDICT task 3).
        # Applied in interpret mode too so CPU tests cover the path.
        x = jnp.pad(x, ((0, 0), (0, 128 - x.shape[1] % 128)))
    stor_itemsize = 1 if int8_slab else jnp.dtype(compute_dtype).itemsize
    slab_mb = ((side.slab_rows + side.hub_rows) * x.shape[1]
               * stor_itemsize) / 2**20
    if slab_mb > 13.0:
        raise ValueError(
            f"slab scratch {slab_mb:.1f} MB won't fit VMEM: rebuild the "
            f"plan with smaller slab_rows for {jnp.dtype(compute_dtype)} "
            f"(preprocess_graph caps f32 slabs automatically)"
        )
    n_pad = plan.n_pad
    xc = x.astype(compute_dtype)
    if x.shape[0] != n_pad:
        xc = jnp.pad(xc, ((0, n_pad - x.shape[0]), (0, 0)))
    # sep (int8-selector) mode: local+remote aggregate the rs-pre-scaled
    # features (the plans carry only the rs[dst] factor); the self-loop
    # term below keeps the full weight on the raw features
    xs = xc
    if plan.pre_scale is not None:
        xs = xc * plan.pre_scale[:, None].astype(compute_dtype)
    if int8_slab:
        # per-pass absmax quantization: the local path aggregates
        # round(xs/s*127) rows as exact int32 sums; the inverse scale is
        # folded into the f32 post-scale below.  The transpose side runs
        # the same code on the COTANGENT — gradients are quantized too,
        # which is why this mode is opt-in (accuracy soak in BENCH.md).
        s = jnp.maximum(
            jnp.max(jnp.abs(xs.astype(jnp.float32))), jnp.float32(1e-30)
        )
        xq = jnp.clip(
            jnp.round(xs.astype(jnp.float32) * (127.0 / s)), -127.0, 127.0
        ).astype(jnp.int8)
        local_x = xq
        dequant = s / 127.0
    else:
        local_x = xs
        dequant = None
    rows_out = side.num_rows_out
    if side.remote is not None:
        # the remote partial is produced directly in the compute dtype —
        # it is read back once per window by the local kernel (and aliased
        # onto its output), so bf16 halves that round-trip
        prev = _apply_plan(xs, side.remote, compute_dtype, interpret,
                           out_dtype=compute_dtype)
        if prev.shape[0] > rows_out:
            # remote windows are coarser than local ones; trailing rows are
            # padding past n_pad and carry only zero-weight slots
            prev = prev[:rows_out]
        elif prev.shape[0] < rows_out:
            prev = jnp.pad(prev, ((0, rows_out - prev.shape[0]), (0, 0)))
        if int8_slab:
            # the kernel accumulates in quantized units; bring the (true-
            # unit) remote partial into them so the final dequant is one
            # scalar multiply on the output
            prev = (prev.astype(jnp.float32) / dequant).astype(compute_dtype)
    else:
        prev = jnp.zeros((rows_out, x.shape[1]), compute_dtype)
    hub_x = None
    if side.hub_ids is not None:
        # the hub block: ONE gather of hub_rows source rows per pass
        # (hub_rows descriptors instead of one per hub edge)
        hub_x = local_x.at[side.hub_ids].get(mode="promise_in_bounds")
    out = _apply_local(local_x, prev, side, compute_dtype, interpret,
                       hub_x=hub_x)[:n_pad]
    out = out.astype(jnp.float32)
    if dequant is not None:
        out = out * dequant
    if plan.pre_scale is not None:
        # sep mode: the rs[dst] factor is constant per output row, so it is
        # applied HERE (f32, fuses with the self-loop add) instead of being
        # carried by sel_dst — which therefore streams as 0/1 int8
        out = out * plan.pre_scale[:, None]
    out = out + plan.w_self[:, None] * xc.astype(jnp.float32)
    return out[: plan.num_nodes, :f_true].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _slab_core(compute_dtype_name: str, interpret: bool, x, plan):
    dtype = jnp.float32 if compute_dtype_name == "float32" else jnp.bfloat16
    return _apply_side(x, plan, plan.fwd, dtype, interpret)


def _slab_core_fwd(compute_dtype_name, interpret, x, plan):
    return _slab_core(compute_dtype_name, interpret, x, plan), plan


def _slab_core_bwd(compute_dtype_name, interpret, plan, g):
    dtype = jnp.float32 if compute_dtype_name == "float32" else jnp.bfloat16
    dx = _apply_side(g, plan, plan.bwd_side, dtype, interpret)
    return dx, _zero_cotangent(plan)


_slab_core.defvjp(_slab_core_fwd, _slab_core_bwd)


def slab_spmm(
    x: jax.Array,
    plan: SlabSpMM,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """out[i] = Σ_{e: dst[e]==i} w[e]·x[src[e]] — differentiable in x.
    Drop-in for :func:`sgformer_tpu.kernels.spmm.chunked_spmm` given a
    :class:`SlabSpMM` plan (edges relabeled by ``reorder_for_slabs``)."""
    return _slab_core(jnp.dtype(compute_dtype).name, interpret, x, plan)
