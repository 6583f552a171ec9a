"""TransConv: the global linear-attention branch of SGFormer.

Spec: ``/root/reference/medium/ours.py:49-177`` (medium/100M: alpha-blended
residual), ``/root/reference/large/ours.py:96-238`` (large: averaged
residual, optional activation).  One module covers all tiers via
``residual_mode``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sgformer_tpu.nn.layers import Dropout, TorchLinear
from sgformer_tpu.ops.attention import linear_attention


class TransConvLayer(nn.Module):
    """QKV projections + global attention + mean over heads
    (``medium/ours.py:49-100``).

    ``kernel`` selects the attention ablation
    (``medium/ablation/parse.py:102-118``):
      - ``"simple"``: SGFormer O(N) linear attention (the default);
      - ``"softmax"``: full softmax attention (``oursSOFT.py``), O(N²);
      - ``"gat"``: scaled-dot-product attention (``oursGAT.py``), O(N²);
      - ``"performer"``: NodeFormer positive-random-feature kernel
        (``oursNF.py``), O(N·M).
    """

    out_channels: int
    num_heads: int = 1
    use_weight: bool = True
    axis_name: Optional[str] = None
    kernel: str = "simple"
    # 'xla' | 'pallas' (fused two-pass kernel) | 'auto' (pallas on the
    # TPU bf16 path — it wins fwd+bwd at the arxiv shape, 3.19 vs 3.26 ms,
    # scripts/microbench_attention.py; xla elsewhere: the f32 path stays
    # the oracle-exact default and CPU runs skip Mosaic entirely)
    impl: str = "xla"
    performer_features: Optional[int] = None
    performer_seed: int = 0

    @nn.compact
    def __call__(
        self, query_input, source_input, output_attn: bool = False, node_mask=None
    ):
        h, d = self.num_heads, self.out_channels
        qs = TorchLinear(d * h, name="Wq")(query_input).reshape(-1, h, d)
        ks = TorchLinear(d * h, name="Wk")(source_input).reshape(-1, h, d)
        if self.use_weight:
            vs = TorchLinear(d * h, name="Wv")(source_input).reshape(-1, h, d)
        else:
            # Reference reshapes to [N, 1, D] (medium/ours.py:84); only valid
            # for num_heads == 1, matching the reference's implicit constraint.
            vs = source_input.reshape(-1, 1, d)

        if self.kernel == "simple":
            on_tpu = jax.default_backend() == "tpu"
            use_pallas = self.impl == "pallas" or (
                self.impl == "auto" and on_tpu and qs.dtype == jnp.bfloat16
            )
            if use_pallas and not output_attn:
                from sgformer_tpu.kernels.attention import fused_linear_attention

                out = fused_linear_attention(
                    qs, ks, vs, node_mask=node_mask,
                    axis_name=self.axis_name, interpret=not on_tpu,
                )
                return out.mean(axis=1)
            if output_attn:
                out, attn = linear_attention(
                    qs, ks, vs, output_attn=True, axis_name=self.axis_name,
                    node_mask=node_mask,
                )
                return out.mean(axis=1), attn
            out = linear_attention(
                qs, ks, vs, axis_name=self.axis_name, node_mask=node_mask
            )
            return out.mean(axis=1)

        from sgformer_tpu.ops.attention_variants import (
            gat_attention,
            performer_attention,
            softmax_attention,
        )

        if self.kernel == "softmax":
            res = softmax_attention(qs, ks, vs, output_attn=output_attn)
        elif self.kernel == "gat":
            res = gat_attention(qs, ks, vs, output_attn=output_attn)
        elif self.kernel == "performer":
            res = performer_attention(
                qs, ks, vs,
                key=jax.random.PRNGKey(self.performer_seed),
                num_features=self.performer_features,
            )
        else:
            raise ValueError(f"unknown attention kernel: {self.kernel}")
        if output_attn:
            if self.kernel == "performer":
                raise ValueError("performer kernel has no dense attention map")
            out, attn = res
            return out.mean(axis=1), attn
        return res.mean(axis=1)


class TransConv(nn.Module):
    """Input MLP + stacked attention layers with residual/LN/dropout.

    ``residual_mode``:
      - ``"alpha"``: ``x = alpha*x + (1-alpha)*prev`` (medium/ours.py:152,
        100M/ours.py:264)
      - ``"mean"``:  ``x = (x + prev)/2``            (large/ours.py:211)
    """

    hidden_channels: int
    num_layers: int = 2
    num_heads: int = 1
    alpha: float = 0.5
    dropout: float = 0.5
    use_bn: bool = True
    use_residual: bool = True
    use_weight: bool = True
    use_act: bool = False
    residual_mode: str = "alpha"
    axis_name: Optional[str] = None
    kernel: str = "simple"
    impl: str = "xla"  # see TransConvLayer.impl
    # rematerialize each attention layer in backward (trade FLOPs for
    # activation memory on big graphs)
    remat: bool = False

    @nn.compact
    def __call__(
        self, x, *, train: bool = False, output_attn: bool = False, node_mask=None
    ):
        dropout = Dropout(self.dropout, deterministic=not train)

        dt = x.dtype  # keep the compute dtype through f32-param LayerNorms
        x = TorchLinear(self.hidden_channels, name="fc_in")(x)
        if self.use_bn:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_in")(x).astype(dt)
        x = nn.relu(x)
        x = dropout(x)

        prev = x
        attns = []
        layer_cls = (
            nn.remat(TransConvLayer, static_argnums=(3,))
            if self.remat and not output_attn
            else TransConvLayer
        )
        for i in range(self.num_layers):
            conv = layer_cls(
                self.hidden_channels,
                num_heads=self.num_heads,
                use_weight=self.use_weight,
                axis_name=self.axis_name,
                kernel=self.kernel,
                impl=self.impl,
                name=f"conv_{i}",
            )
            if output_attn:
                x, attn = conv(x, x, True, node_mask)
                attns.append(attn)
            else:
                x = conv(x, x, False, node_mask)
            if self.use_residual:
                if self.residual_mode == "alpha":
                    x = self.alpha * x + (1.0 - self.alpha) * prev
                else:
                    x = (x + prev) / 2.0
            if self.use_bn:
                x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x).astype(dt)
            if self.use_act:
                x = nn.relu(x)
            x = dropout(x)
            prev = x

        if output_attn:
            return x, jnp.stack(attns, axis=0)  # [L, N, N]
        return x
