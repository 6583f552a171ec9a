"""Can bitcasting rows to wider elements beat the 7.4 ns/row gather wall?

microbench_gather.py showed jnp.take row rate depends on COLUMN COUNT,
not bytes: F=64 -> 372 Mrows/s (2.7 ns) vs F=256 -> 135 Mrows/s (7.4 ns)
at the same dtype.  If a [N, 256] bf16 table gathered as a [N, 128] f32
or [N, 64] complex64 view keeps the narrow-row rate, the SpMM gather wall
drops ~3x for free.  Salted fori-loop protocol (CLAUDE.md).
Run alone: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np

K = 20


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"device: {jax.devices()[0]}", flush=True)

    N = 169_343
    E = 2_500_000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    xb = jnp.asarray(rng.standard_normal((N, 256)), dtype=jnp.bfloat16)

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

    def report(name, ms):
        print(f"{name}: {ms:7.2f} ms ({E/ms/1e3:6.1f} Mrows/s, "
              f"{ms/E*1e6:5.2f} ns/row)", flush=True)

    # --- baseline: straight bf16 gather [N, 256] ---
    def plain_loop(salt, x, ix):
        def body(i, carry):
            ix_c, acc = carry
            out = jnp.take(x, ix_c, axis=0)
            probe = jnp.sum(out.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, ix_c ^ 1, ix_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (ix, salt))[1]

    report("bf16 [N,256] plain     ", timed(plain_loop, xb, idx))

    # --- f32 view [N,128]: bitcast outside the loop, cast back inside ---
    def f32view_loop(salt, x, ix):
        xv = jax.lax.bitcast_convert_type(
            x.reshape(N, 128, 2), jnp.float32
        )  # [N, 128] f32 view

        def body(i, carry):
            ix_c, acc = carry
            out = jnp.take(xv, ix_c, axis=0)  # [E, 128] f32
            ob = jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(
                E, 256
            )
            probe = jnp.sum(ob.astype(jnp.float32)) + salt
            return jnp.where(probe > 1e30, ix_c ^ 1, ix_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (ix, salt))[1]

    report("f32  view [N,128]      ", timed(f32view_loop, xb, idx))

    # --- complex64 view [N,64] (may be unsupported by BitcastConvert) ---
    try:
        def c64view_loop(salt, x, ix):
            xf = jax.lax.bitcast_convert_type(
                x.reshape(N, 128, 2), jnp.float32
            )
            xv = jax.lax.complex(xf[:, 0::2], xf[:, 1::2])  # [N, 64] c64

            def body(i, carry):
                ix_c, acc = carry
                out = jnp.take(xv, ix_c, axis=0)  # [E, 64] c64
                probe = (jnp.sum(jnp.real(out)) + jnp.sum(jnp.imag(out))
                         + salt)
                return jnp.where(probe > 1e30, ix_c ^ 1, ix_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (ix, salt))[1]

        report("c64  view [N,64]       ", timed(c64view_loop, xb, idx))
    except Exception as e:  # noqa: BLE001
        print(f"c64 view failed: {type(e).__name__}: {e}", flush=True)

    # --- narrow-F reference curve, bf16 plain ---
    for F2 in (16, 32, 64, 128):
        xs = xb[:, :F2]
        report(f"bf16 [N,{F2:3d}] plain     ", timed(plain_loop, xs, idx))

    # --- f32 views of narrow slices: [N,64]bf16 -> [N,32]f32 etc ---
    for F2, FV in ((64, 32), (128, 64)):
        def viewloop(salt, x, ix, F2=F2, FV=FV):
            xv = jax.lax.bitcast_convert_type(
                x[:, :F2].reshape(N, FV, 2), jnp.float32
            )

            def body(i, carry):
                ix_c, acc = carry
                out = jnp.take(xv, ix_c, axis=0)
                probe = jnp.sum(out) + salt
                return jnp.where(probe > 1e30, ix_c ^ 1, ix_c), acc + probe
            return jax.lax.fori_loop(0, K, body, (ix, salt))[1]

        report(f"f32  view [N,{FV:3d}] (of {F2:3d})", timed(viewloop, xb, idx))

    # --- two half-width f32-view gathers == full row, 2x[N,64]f32 ---
    def twohalf_loop(salt, x, ix):
        xv = jax.lax.bitcast_convert_type(x.reshape(N, 128, 2), jnp.float32)
        a, b = xv[:, :64], xv[:, 64:]

        def body(i, carry):
            ix_c, acc = carry
            o1 = jnp.take(a, ix_c, axis=0)
            o2 = jnp.take(b, ix_c, axis=0)
            probe = jnp.sum(o1) + jnp.sum(o2) + salt
            return jnp.where(probe > 1e30, ix_c ^ 1, ix_c), acc + probe
        return jax.lax.fori_loop(0, K, body, (ix, salt))[1]

    report("2x f32 view [N,64] halves", timed(twohalf_loop, xb, idx))


if __name__ == "__main__":
    main()
