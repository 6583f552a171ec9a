"""Masked, mesh-aware BatchNorm.

The reference uses ``torch.nn.BatchNorm1d`` in the GraphConv/GCN branches
(``/root/reference/large/ours.py:54-58``, ``medium/models.py:24-30``).  Two
TPU realities the torch module doesn't face:

1. **Padding**: static-shape sharding pads the node dimension; padded rows
   must not contaminate batch statistics.  Stats are computed over a
   ``node_mask`` when given.
2. **Sharding**: under a node-sharded mesh, the batch statistics are a
   cross-shard reduction — one ``psum`` of (count, Σx, Σx²) per norm layer
   (SURVEY.md §7 "BatchNorm under sharding").

Semantics match torch ``BatchNorm1d`` defaults: eps 1e-5, momentum 0.1
(flax-style ``momentum=0.9`` decay), biased variance for normalization,
**unbiased** variance for the running estimate (torch behavior; flax's
built-in BatchNorm tracks the biased one).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool, node_mask: Optional[jax.Array] = None):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if node_mask is None:
                cnt = jnp.asarray(x.shape[0], jnp.float32)
                s1 = xf.sum(axis=0)
                s2 = (xf * xf).sum(axis=0)
            else:
                m = node_mask.astype(jnp.float32)[:, None]
                cnt = m.sum()
                s1 = (xf * m).sum(axis=0)
                s2 = (xf * xf * m).sum(axis=0)
            if self.axis_name is not None:
                cnt, s1, s2 = jax.lax.psum((cnt, s1, s2), self.axis_name)
            if node_mask is not None:
                # empty padded group (all-masked): 0/0 would poison the
                # grads of every dp peer through the gradient pmean; with
                # >=1 real node the max() is a bit-exact no-op
                cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased
                )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        # stats/affine in f32, output back in the compute dtype
        return y.astype(x.dtype)
