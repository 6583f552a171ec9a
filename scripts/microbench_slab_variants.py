"""Isolate the slab kernel's per-step cost: dynamic-slice copy vs MXU.

Variants: A = production kernel; B = static sub-block slice (wrong
results, timing only); C = without the src one-hot matmul (dst only).
Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time
from functools import partial

import numpy as np

K = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from sgformer_tpu.data.loaders import synthetic_dataset
    from sgformer_tpu.graph import preprocess_graph
    from sgformer_tpu.kernels import slab_spmm as ss

    N, E_dir = 169_343, 1_166_243
    ds = synthetic_dataset(num_nodes=N, num_edges=E_dir, num_features=8,
                           num_classes=40, seed=0)
    g = preprocess_graph(ds.graph["edge_index"], N, with_chunks=True,
                        spmm_mode="slab")
    side = g.chunks.fwd
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.chunks.n_pad, 256)),
                    dtype=jnp.bfloat16)

    salt_counter = [0.0]

    def timed(f, *args):
        fj = jax.jit(f)

        def call():
            salt_counter[0] += 1.0
            return float(fj(jnp.float32(salt_counter[0]), *args))

        call()
        t0 = time.perf_counter()
        call()
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        call()
        dt2 = time.perf_counter() - t0
        return min(dt1, dt2) / K * 1e3

    def make_variant(mode):
        def kern(win_ref, slab_ref, sub_ref, lsrc_ref, ldst_ref, w_ref,
                 x_any, out_ref, slab_scratch, dma_sem, *, Q, C, B, W, R, H,
                 compute_dtype):
            i = pl.program_id(0)
            prev_w = win_ref[jnp.maximum(i - 1, 0)]
            is_first = jnp.logical_or(i == 0, win_ref[i] != prev_w)
            prev_s = slab_ref[jnp.maximum(i - 1, 0)]
            new_slab = jnp.logical_or(i == 0, slab_ref[i] != prev_s)

            @pl.when(new_slab)
            def _():
                dma = pltpu.make_async_copy(
                    x_any.at[pl.ds(pl.multiple_of(slab_ref[i] * H, H), R), :],
                    slab_scratch, dma_sem)
                dma.start()
                dma.wait()

            lv = lsrc_ref[0]
            dv = ldst_ref[0]
            wv = w_ref[0]
            acc = jnp.zeros((W, out_ref.shape[1]), dtype=jnp.float32)
            for q in range(Q):
                sub = sub_ref[0, 0, q]
                lsrc = jax.lax.slice(lv, (q, 0), (q + 1, C))
                ldst = jax.lax.slice(dv, (q, 0), (q + 1, C))
                w = jax.lax.slice(wv, (q, 0), (q + 1, C))
                sel_src_t = jnp.where(
                    jnp.broadcast_to(lsrc, (B, C))
                    == jax.lax.broadcasted_iota(jnp.int32, (B, C), 0),
                    jnp.broadcast_to(w, (B, C)), 0.0,
                ).astype(compute_dtype)
                if mode == "static_sub":
                    blk = slab_scratch[0:B, :]
                else:
                    blk = slab_scratch[
                        pl.ds(pl.multiple_of(sub * B, B), B), :]
                if mode == "no_src_matmul":
                    msgs = blk[0:C, :].astype(jnp.float32) * 1.0001
                else:
                    msgs = jax.lax.dot_general(
                        sel_src_t, blk.astype(compute_dtype),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                sel_dst = jnp.where(
                    jnp.broadcast_to(ldst, (W, C))
                    == jax.lax.broadcasted_iota(jnp.int32, (W, C), 0),
                    1.0, 0.0).astype(compute_dtype)
                acc = acc + jnp.dot(
                    sel_dst, msgs.astype(compute_dtype),
                    preferred_element_type=jnp.float32)

            @pl.when(is_first)
            def _():
                out_ref[:] = acc

            @pl.when(jnp.logical_not(is_first))
            def _():
                out_ref[:] = out_ref[:] + acc

        return kern

    def apply_variant(x_pad, side, mode):
        W, B, C, Q = (side.window_rows, side.block_rows, side.chunk_edges,
                      side.chunks_per_step)
        F = x_pad.shape[1]
        R, H = side.slab_rows, side.base_rows
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(side.n_steps,),
            in_specs=[
                pl.BlockSpec((1, 1, Q), lambda i, w_, s_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Q, C), lambda i, w_, s_: (i, 0, 0)),
                pl.BlockSpec((1, Q, C), lambda i, w_, s_: (i, 0, 0)),
                pl.BlockSpec((1, Q, C), lambda i, w_, s_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((W, F), lambda i, w_, s_: (w_[i], 0)),
            scratch_shapes=[
                pltpu.VMEM((R, F), x_pad.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        kernel = partial(make_variant(mode), Q=Q, C=C, B=B, W=W, R=R, H=H,
                         compute_dtype=jnp.bfloat16)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((side.num_rows_out, F),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(side.window_id, side.slab_id, side.subblock, side.local_src,
          side.local_dst, side.weight, x_pad)

    for mode in ("prod", "static_sub", "no_src_matmul"):
        def loop(salt, xp, s=side, m=mode):
            def body(i, carry):
                x_c, acc = carry
                out = apply_variant(x_c, s, m)
                probe = jnp.sum(out) + salt
                return jnp.where(probe > 1e30, x_c + 1, x_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (xp, salt))[1]

        ms = timed(loop, x)
        print(f"{mode}: {ms:7.2f} ms ({ms/side.n_steps*1e3:.2f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
