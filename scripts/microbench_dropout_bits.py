"""Dropout mask generation variants on the chip: 32 vs 8 random bits/elem.

``jax.random.bernoulli`` draws 32 bits per element and compares a float;
a dropout mask only needs enough bits to express the rate (the published
recipes use 0.5).  Variants (7 masks of [N, 256] per iteration, rbg keys):

  A. bernoulli (current nn.Dropout path)
  B. jax.random.bits u8 + compare (rbg may or may not lower to a narrow
     RngBitGenerator)
  C. bits u32 of [N, 64] bitcast to u8 [N, 256] + compare (guaranteed
     4x fewer generated bits)

Salted fori-loop protocol (CLAUDE.md).  Run alone:
PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

K = 10
N = 169_343


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

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

    key = jax.random.key(0, impl="rbg")

    def loop(mask_fn):
        def f(salt, k):
            def body(i, carry):
                k_c, acc = carry
                k_c = jax.random.fold_in(k_c, i)
                tot = salt
                for j in range(7):
                    m = mask_fn(jax.random.fold_in(k_c, j))
                    tot = tot + jnp.sum(m.astype(jnp.float32))
                return k_c, acc + tot
            return jax.lax.fori_loop(0, K, body, (k, salt))[1]
        return f

    ms = timed(loop(lambda k: jax.random.bernoulli(k, 0.5, (N, 256))), key)
    print(f"A bernoulli rbg          : {ms:6.2f} ms/iter", flush=True)

    ms = timed(loop(
        lambda k: jax.random.bits(k, (N, 256), jnp.uint8) < 128), key)
    print(f"B bits u8 + cmp          : {ms:6.2f} ms/iter", flush=True)

    def u32_bitcast(k):
        b = jax.random.bits(k, (N, 64), jnp.uint32)
        return jax.lax.bitcast_convert_type(b, jnp.uint8).reshape(N, 256) < 128

    ms = timed(loop(u32_bitcast), key)
    print(f"C bits u32 bitcast u8+cmp: {ms:6.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
