"""SGFormer linear global attention — functional XLA reference path.

The kernel (spec: ``/root/reference/medium/ours.py:14-46``, identical at
``large/ours.py:130-156`` and ``100M/ours.py:12-53``) is an O(N·H·M·D)
all-pair attention:

1. q and k are scaled by their GLOBAL Frobenius norms — one scalar per
   tensor, NOT per-row.  (Per-row normalization is the classic mistake the
   survey flags; the global scalar makes q·k ≪ N so the ``+N·v`` identity
   term dominates — intentional per the paper.)
2. numerator  = q @ (kᵀv)  + N·v           ([N,H,D])
3. denominator = q · (Σₗ k) + N            ([N,H,1])
4. out = numerator / denominator, then mean over heads (done by the caller).

TPU notes: everything here is a dense einsum → MXU.  Because the norms are
global scalars, the whole kernel is algebraically a *sum-then-rescale*:
``kᵀv``, ``Σk``, ``‖q‖²``, ``‖k‖²`` are plain sums over nodes.  Under a
node-sharded mesh each shard computes its local partial sums and a single
``psum`` of ([H,M,D] + [H,M] + 2 scalars) makes the op exactly
sequence-parallel — see ``sgformer_tpu/dist/sharded.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear_attention(
    qs: jax.Array,
    ks: jax.Array,
    vs: jax.Array,
    output_attn: bool = False,
    axis_name: Optional[str] = None,
    node_mask: Optional[jax.Array] = None,
):
    """SGFormer linear attention.

    Args:
      qs: [N, H, M] queries.
      ks: [L, H, M] keys (L == N in all reference uses).
      vs: [L, H, D] values (H may be 1 and broadcast when ``use_weight`` is
        off, mirroring ``medium/ours.py:84``).
      output_attn: also return the materialized [N, L] mean-head attention
        map (only feasible for small graphs; ``medium/ours.py:37-40``).
      axis_name: if set, the node dimension is sharded over this mesh axis;
        all cross-node sums are reduced with one fused ``psum``.
      node_mask: [N] 0/1 validity mask for padded node rows (static-shape
        sharding pads N).  Masked rows contribute nothing to the global
        norms / kv sums, and N in the ``+N·v`` identity term becomes the
        true (global) count of real nodes.

    Returns:
      [N, H, D] attention output (and optionally the [N, L] map).
    """
    compute_dtype = qs.dtype

    if node_mask is not None:
        m = node_mask.astype(qs.dtype)[:, None, None]
        qs = qs * m
        ks = ks * m
        vs = vs * m
        n_local = jnp.sum(node_mask.astype(jnp.float32))
    else:
        n_local = jnp.asarray(qs.shape[0], jnp.float32)

    # Global Frobenius norms (sum over EVERY element of the tensor).
    q_sq = jnp.sum(jnp.square(qs.astype(jnp.float32)))
    k_sq = jnp.sum(jnp.square(ks.astype(jnp.float32)))
    # Un-normalized cross-node sums; the scalar norms divide out afterwards,
    # so a sharded run needs exactly one psum of these partials.
    kvs = jnp.einsum("lhm,lhd->hmd", ks, vs, preferred_element_type=jnp.float32)
    ks_sum = jnp.sum(ks.astype(jnp.float32), axis=0)  # [H, M]

    if axis_name is not None:
        n_total, q_sq, k_sq, kvs, ks_sum = jax.lax.psum(
            (n_local, q_sq, k_sq, kvs, ks_sum), axis_name
        )
    else:
        n_total = n_local

    if node_mask is None:
        q_norm = jnp.sqrt(q_sq)
        k_norm = jnp.sqrt(k_sq)
        inv_qk = 1.0 / (q_norm * k_norm)
    else:
        # a fully-masked (empty) padded shard group has zero norms.  The
        # guards must sit on the INPUTS of sqrt/divide (not a post-hoc
        # where) or the backward still produces inf*0 = nan through the
        # untaken branch; with >=1 real node q_sq/k_sq > 0 and every
        # branch below is bit-exact with the unmasked formula.
        nonzero = (q_sq > 0.0) & (k_sq > 0.0)
        q_norm = jnp.sqrt(jnp.where(q_sq > 0.0, q_sq, 1.0))
        k_norm = jnp.sqrt(jnp.where(k_sq > 0.0, k_sq, 1.0))
        inv_qk = jnp.where(nonzero, 1.0 / (q_norm * k_norm), 0.0)

    num = (
        jnp.einsum("nhm,hmd->nhd", qs, kvs, preferred_element_type=jnp.float32) * inv_qk
        + n_total * vs
    )
    den = (
        jnp.einsum("nhm,hm->nh", qs, ks_sum, preferred_element_type=jnp.float32)
        * inv_qk
        + n_total
    )[..., None]
    if node_mask is not None:
        den = jnp.where(den == 0.0, 1.0, den)
    out = (num / den).astype(compute_dtype)

    if output_attn:
        # [N, L] mean-head map divided by the mean-head normalizer
        # (medium/ours.py:37-40).  Materializes N·L — small graphs only.
        attn = (
            jnp.einsum("nhm,lhm->nlh", qs, ks, preferred_element_type=jnp.float32)
            * inv_qk
        ).mean(axis=-1)
        attn = attn / den.squeeze(-1).mean(axis=-1, keepdims=True)
        return out, attn
    return out
