"""Test config: force an 8-device virtual CPU mesh BEFORE jax initializes.

The environment's sitecustomize registers the axon TPU plugin and pins
``jax_platforms="axon,cpu"`` at interpreter start, so plain env vars are
not enough — we override via jax.config here, before any backend is used.

All sharding tests (node-sharded attention psum, edge-sharded SpMM, pjit
train step) run against this virtual mesh; real-TPU behavior is covered by
the driver's bench/compile checks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float64 numpy oracles; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")
