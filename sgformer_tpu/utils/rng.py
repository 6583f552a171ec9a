"""Training RNG keys: hardware bit generation on TPU.

Dropout-mask generation with JAX's default threefry2x32 software PRNG is
a measurable fraction of the SGFormer train step (6-7 [N, 256] masks per
step); the TPU's hardware ``RngBitGenerator`` ("rbg") produces the same
masks far faster.  Measured on the arxiv-shaped bench step
(scripts/microbench_nonspmm.py, v5e): 7x bernoulli [169K, 256] 9.2 ms
(threefry) vs 6.1 ms (rbg); full ssel train step 102 -> 73 ms.

``impl="auto"`` picks rbg on TPU backends and threefry elsewhere:
threefry streams are bit-identical across backends and compiler
versions, while rbg is only guaranteed stable within one
backend+compiler — fine for same-system run-to-run determinism (what
the reference's ``fix_seed`` provides, ``large/main.py:22-29``, and what
``tests/test_train.py``'s trajectory test pins), wrong for cross-backend
golden comparisons, which is exactly where the CPU test suite keeps
threefry.
"""

from __future__ import annotations

import jax


def train_key(seed: int, impl: str = "auto") -> jax.Array:
    """A typed PRNG key for the training loop's dropout/init streams."""
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    return jax.random.key(seed, impl=impl)
