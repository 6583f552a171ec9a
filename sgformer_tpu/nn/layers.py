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
