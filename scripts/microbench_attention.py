"""Fused pallas linear attention vs the XLA einsum path, arxiv shape.

Round-2c: the pallas VJP's host-side jnp.pad/slice copies (9 full-array
copies per fwd+bwd) were replaced by in-kernel tail masking.  Salted
fori-loop protocol (CLAUDE.md).  Run alone:
PYTHONPATH=/root/repo:/root/.axon_site.
"""

import time

import numpy as np

K = 30


def main():
    import jax
    import jax.numpy as jnp

    from sgformer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from sgformer_tpu.kernels.attention import fused_linear_attention
    from sgformer_tpu.ops.attention import linear_attention

    N, H, M = 169_343, 1, 256
    rng = np.random.default_rng(0)
    # DISTINCT q/k/v (aliased operands would let XLA read one array for
    # three roles — unrepresentative of the real TransConv call)
    q = jnp.asarray(rng.standard_normal((N, H, M)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((N, H, M)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((N, H, M)) * 0.1, jnp.bfloat16)

    salt = [0.0]

    def timed(label, f):
        def run(s, qq, kk, vv):
            def it(i, carry):
                s, acc = carry
                # salt in the COMPUTE dtype: an f32 salt would promote the
                # whole graph to f32
                out = f(qq + s.astype(qq.dtype), kk, vv)
                probe = jnp.sum(out.astype(jnp.float32))
                return (s + probe * 0.0 + 1.0, acc + probe)

            return jax.lax.fori_loop(0, K, it, (s, jnp.float32(0.0)))[1]

        fj = jax.jit(run)

        def call():
            salt[0] += 1.0
            return float(fj(jnp.float32(salt[0] * 1e-12), q, k, v))

        call()
        best = min(
            (lambda t0=time.perf_counter(): (call(), time.perf_counter() - t0)[1])()
            for _ in range(3)
        )
        print(f"{label:40s} {best / K * 1e3:7.3f} ms", flush=True)

    # fwd only
    timed("XLA fwd", lambda qq, kk, vv: linear_attention(qq, kk, vv))
    timed("pallas fwd",
          lambda qq, kk, vv: fused_linear_attention(qq, kk, vv))

    # fwd + bwd: consume ALL THREE grads (returning just one lets XLA
    # dead-code-eliminate the others and flatters the einsum path)
    def g_x(qq, kk, vv):
        gs = jax.grad(
            lambda a, b, c: jnp.sum(
                linear_attention(a, b, c).astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )(qq, kk, vv)
        return gs[0] + gs[1] + gs[2]

    def g_p(qq, kk, vv):
        gs = jax.grad(
            lambda a, b, c: jnp.sum(
                fused_linear_attention(a, b, c).astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )(qq, kk, vv)
        return gs[0] + gs[1] + gs[2]

    timed("XLA fwd+bwd", g_x)
    timed("pallas fwd+bwd", g_p)


if __name__ == "__main__":
    import sys
    if "__sweep__" in sys.argv:
        pass  # sweep runs from the guard below
    else:
        main()


def sweep_blocks():
    import jax
    import jax.numpy as jnp
    from sgformer_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from sgformer_tpu.kernels.attention import fused_linear_attention
    import time
    N, H, M = 169_343, 1, 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((N, H, M)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((N, H, M)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((N, H, M)) * 0.1, jnp.bfloat16)
    salt = [0.0]
    for blk in (1024, 2048, 4096):
        def run(s, qq, kk, vv, _blk=blk):
            def it(i, carry):
                s, acc = carry
                out = fused_linear_attention(qq + s.astype(qq.dtype), kk, vv,
                                             block=_blk)
                probe = jnp.sum(out.astype(jnp.float32))
                return (s + probe * 0.0 + 1.0, acc + probe)
            return jax.lax.fori_loop(0, K, it, (s, jnp.float32(0.0)))[1]
        fj = jax.jit(run)
        def call():
            salt[0] += 1.0
            return float(fj(jnp.float32(salt[0] * 1e-12), q, k, v))
        call()
        best = min((lambda t0=time.perf_counter():
                    (call(), time.perf_counter() - t0)[1])() for _ in range(3))
        print(f"pallas fwd block={blk:5d} {best / K * 1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__" and "__sweep__" in __import__("sys").argv:
    sweep_blocks()
