"""Column-stat reductions: VPU multiply-reduce fusions vs MXU GEMM trick.

The BN backward needs per-column sums over [N, F] activations
(S1 = Σₙ dy, S2 = Σₙ dy·x̂).  XLA lowers these axis-0 reductions to
multiply-reduce loop fusions that measure ~5x below HBM peak on v5e
(profile round 3: bn_in bwd stats 1.13 ms for a 174 MB read).  The same
quantities are expressible as matmuls — S1 = ones[1,N]@dy and
Σ(dy·x) = diag(dyᵀ@x) — which stream both operands at full bandwidth
through the MXU and reduce in f32.

Protocol: salted fori_loop with a data dependency (CLAUDE.md — the relay
memoizes identical dispatches)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from sgformer_tpu.utils import enable_compilation_cache

enable_compilation_cache()
assert jax.default_backend() == "tpu"

N, F = 169_343, 256
K_ITERS = 30


def timed(fn, x, y):
    """Each call gets a FRESH salt — the relay memoizes repeat dispatches
    with identical (computation, args)."""
    fn_j = jax.jit(fn)
    out = fn_j(x, y, jnp.float32(0.111))  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn_j(x, y, jnp.float32(0.222))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3


def loop(body):
    """K salted iterations with a data dependency through the carry."""

    def run(x, y, salt):
        def step(i, carry):
            x_c, acc = carry
            s1, s2 = body(x_c, y)
            probe = s1.sum() + s2.sum() + salt * i
            # thread the probe back into x so every iteration recomputes
            # (adding ~0 in the compute dtype; the value is unchanged to
            # within one ulp but XLA cannot hoist the stats)
            x_c = x_c + (probe * jnp.float32(1e-30)).astype(x_c.dtype)
            return x_c, acc + probe

        return jax.lax.fori_loop(0, K_ITERS, step, (x, jnp.float32(0)))[1]

    return run


def vpu_stats(x, y):
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    return xf.sum(axis=0), (yf * xf).sum(axis=0)


def mxu_stats(x, y):
    ones = jnp.ones((1, x.shape[0]), x.dtype)
    s1 = jnp.einsum("on,nf->f", ones, x, preferred_element_type=jnp.float32)
    prod = jnp.einsum("nc,nd->cd", y, x, preferred_element_type=jnp.float32)
    return s1, jnp.diagonal(prod)


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.standard_normal((N, F)), dtype=dtype)
        y = jnp.asarray(rng.standard_normal((N, F)), dtype=dtype)
        for name, body in (("vpu", vpu_stats), ("mxu", mxu_stats)):
            ms = timed(loop(body), x, y) / K_ITERS
            print(f"{jnp.dtype(dtype).name:8s} {name}: {ms:7.3f} ms/iter")
        # numerics check
        s1v, s2v = vpu_stats(x, y)
        s1m, s2m = mxu_stats(x, y)
        err1 = float(jnp.max(jnp.abs(s1v - s1m)) / (jnp.max(jnp.abs(s1v)) + 1e-9))
        err2 = float(jnp.max(jnp.abs(s2v - s2m)) / (jnp.max(jnp.abs(s2v)) + 1e-9))
        print(f"  rel err s1 {err1:.2e}  s2 {err2:.2e}")


if __name__ == "__main__":
    main()
