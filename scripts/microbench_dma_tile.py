"""Measure pallas DMA descriptor rate: 8-row (4KB) tile gathers from HBM.

If the DMA engines sustain a few ns/descriptor with S outstanding copies,
remote-edge gathers can stream INSIDE the slab kernel, overlapped with
MXU work — unlike the XLA gather, which is a serial 7.4 ns/row op.
Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

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
    print(f"device: {jax.devices()[0]}", flush=True)

    N = 169_344  # multiple of 8
    F = 256
    E = 262_144  # tiles to gather
    C = 256  # tiles per grid step
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)), dtype=jnp.bfloat16)

    for S in (8, 32):
        def dma_kernel(idx_ref, x_hbm, out_ref, scratch, sems):
            def get_dma(j):
                base = idx_ref[0, 0, j] * 8
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(pl.multiple_of(base, 8), 8), :],
                    scratch.at[pl.ds(j * 8, 8), :],
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
            out_ref[:] = jnp.sum(
                scratch[:].reshape(8, C, F).astype(jnp.float32), axis=1
            )

        gather_dma = pl.pallas_call(
            dma_kernel,
            grid=(E // C,),
            in_specs=[
                pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((8, F), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((C * 8, F), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((S,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        idx = jnp.asarray(
            rng.integers(0, N // 8, (E // C, 1, C)).astype(np.int32)
        )

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

        def loop(salt, x, idx):
            def body(i, carry):
                idx_c, acc = carry
                out = gather_dma(idx_c, x)
                probe = jnp.sum(out) + salt
                idx_c = jnp.where(probe > 1e30, idx_c ^ 1, idx_c)
                return idx_c, acc + probe
            return jax.lax.fori_loop(0, K, body, (idx, salt))[1]

        ms = timed(loop, x, idx)
        gb = E * 8 * F * 2 / 1e9
        print(
            f"tile-DMA gather S={S}: {ms:7.2f} ms for {E} tiles "
            f"({E/ms/1e3:.1f} Mtiles/s, {ms/E*1e6:.1f} ns/tile, "
            f"{gb/ms*1e3:.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
