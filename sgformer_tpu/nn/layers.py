"""Shared building blocks for all model families."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch ``nn.Linear`` default weight init: kaiming_uniform(a=√5),
    which reduces to U(-1/√fan_in, 1/√fan_in).  Flax kernels are
    [fan_in, fan_out], so fan_in is shape[0]."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with PyTorch's default ``nn.Linear`` initialization, so
    training recipes tuned against the reference transfer unchanged."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", _torch_linear_kernel_init, (fan_in, self.features)
        )
        y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + bias.astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with torch's eps=1e-5 default (flax defaults to 1e-6)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x)


def batch_norm(x, *, train: bool, name: str = "bn"):
    """BatchNorm1d equivalent: torch momentum 0.1 == flax momentum 0.9."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )(x)


class Dropout(nn.Module):
    """``flax.linen.Dropout`` with 8-bit mask draws.

    ``jax.random.bernoulli`` generates 32 random bits per element and
    compares a float; a dropout mask only needs enough bits to express the
    rate.  When ``keep = 1 - rate`` is a multiple of 1/256 (which covers
    every published SGFormer recipe: 0.0/0.125/0.25/0.5/0.75) the mask is
    drawn as ``u8 bits < keep*256`` — the identical Bernoulli(keep)
    distribution from 4x fewer generated bits.  Measured on the bench
    step's 7 [169K, 256] masks (v5e, hardware rbg keys): 7.04 -> 4.29 ms
    (scripts/microbench_dropout_bits.py).  Rates off the 1/256 grid fall
    back to ``jax.random.bernoulli`` exactly.
    """

    rate: float
    deterministic: bool | None = None
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        det = (deterministic if deterministic is not None
               else self.deterministic)
        if det or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        keep = 1.0 - self.rate
        rng = self.make_rng(self.rng_collection)
        q = round(keep * 256.0)
        if 0 < q < 256 and abs(q / 256.0 - keep) < 1e-12:
            mask = jax.random.bits(rng, x.shape, jnp.uint8) < jnp.uint8(q)
        else:
            mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
