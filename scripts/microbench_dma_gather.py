"""Measure pallas per-row DMA gather rate vs XLA's take (quiet host!).

The XLA row gather runs at ~135-140 Mrows/s (7.2 ns/row) independent of
dtype and locality.  If an in-kernel DMA pipeline (S outstanding row
copies) beats that, the SpMM can fuse gather+scatter into one kernel and
never materialize [E, F] messages in HBM.  Run with
PYTHONPATH=/root/repo:/root/.axon_site and NOTHING else on the host.
"""

import functools
import time

import numpy as np

K = 10  # timed iterations inside one dispatch


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    N = 169_343
    E = 1_048_576  # 1M rows, power of two for clean chunking
    F = 256
    C = 512  # rows per grid step
    S = 16  # outstanding DMAs
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N, E).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((N, F)), dtype=jnp.bfloat16)

    def dma_kernel(idx_ref, x_hbm, out_ref, scratch, sems):
        # idx_ref: [1, 1, C] int32 in SMEM (dynamic scalar reads);
        # out_ref: [8, F] per-step reduce output; scratch: [C, F] VMEM.
        def get_dma(j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[0, 0, j], 1), :],
                scratch.at[pl.ds(j, 1), :],
                sems.at[j % S],
            )

        def start(j, _):
            get_dma(j).start()
            return 0

        jax.lax.fori_loop(0, S, start, 0)

        def body(j, _):
            get_dma(j).wait()

            @pl.when(j + S < C)
            def _():
                get_dma(j + S).start()

            return 0

        jax.lax.fori_loop(0, C, body, 0)
        # touch the data so the DMAs can't be elided
        out_ref[:] = jnp.sum(
            scratch[:].reshape(8, C // 8, F).astype(jnp.float32), axis=1
        )

    gather_dma = pl.pallas_call(
        dma_kernel,
        grid=(E // C,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, F), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    idx2 = jnp.asarray(idx.reshape(E // C, 1, C))

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

    def dma_loop(salt, x, idx2):
        def body(i, carry):
            idx_c, acc = carry
            out = gather_dma(idx_c, x)
            probe = jnp.sum(out) + salt
            idx_c = jnp.where(probe > 1e30, idx_c ^ 1, idx_c)
            return idx_c, acc + probe
        return jax.lax.fori_loop(0, K, body, (idx2, salt))[1]

    ms = timed(dma_loop, x, idx2)
    print(
        f"pallas DMA gather (C={C}, S={S}): {ms:7.2f} ms for {E} rows"
        f" -> {E/ms/1e3:.1f} Mrows/s ({ms/E*1e6:.2f} ns/row)",
        flush=True,
    )

    # XLA take on the same quiet host for comparison
    def take_loop(salt, x, idx):
        def body(i, carry):
            idx_c, acc = carry
            out = jnp.take(x, idx_c, axis=0)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            idx_c = jnp.where(probe > 1e30, idx_c ^ 1, idx_c)
            return idx_c, acc + probe
        return jax.lax.fori_loop(0, K, body, (idx, salt))[1]

    ms = timed(take_loop, x, jnp.asarray(idx))
    print(
        f"XLA take              : {ms:7.2f} ms for {E} rows"
        f" -> {E/ms/1e3:.1f} Mrows/s ({ms/E*1e6:.2f} ns/row)",
        flush=True,
    )


if __name__ == "__main__":
    main()
