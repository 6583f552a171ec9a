"""Ablation attention kernels — the alternatives SGFormer was ablated
against (``/root/reference/medium/ablation/ours{SOFT,GAT,NF}.py``, selected
by ``--attention {softmax,gat,nodeformer}`` at
``medium/ablation/parse.py:102-118``).

All dense einsums → MXU.  The softmax/GAT variants materialize the [N,L,H]
score tensor (O(N²) — ablation-scale graphs only, as in the reference);
the NodeFormer/Performer variant is O(N·M) linear like the main kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def softmax_attention(qs, ks, vs, output_attn: bool = False):
    """Full softmax attention over globally-normalized q/k
    (``oursSOFT.py:14-34``): scores = qs·ksᵀ after dividing each tensor by
    its global Frobenius norm, softmax over source nodes, aggregate."""
    qs = qs / jnp.linalg.norm(qs.reshape(-1))
    ks = ks / jnp.linalg.norm(ks.reshape(-1))
    scores = jnp.einsum("nhm,lhm->nlh", qs, ks, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores, axis=1)
    out = jnp.einsum("nlh,lhd->nhd", weights, vs, preferred_element_type=jnp.float32)
    out = out.astype(vs.dtype)
    if output_attn:
        return out, weights.mean(axis=-1)
    return out


def gat_attention(qs, ks, vs, output_attn: bool = False):
    """Scaled-dot-product attention (``oursGAT.py:31-43``): no global
    normalization, scores / sqrt(dk), softmax over source nodes."""
    dk = qs.shape[-1]
    scores = (
        jnp.einsum("nhm,lhm->nlh", qs, ks, preferred_element_type=jnp.float32)
        / math.sqrt(dk)
    )
    weights = jax.nn.softmax(scores, axis=1)
    out = jnp.einsum("nlh,lhd->nhd", weights, vs, preferred_element_type=jnp.float32)
    out = out.astype(vs.dtype)
    if output_attn:
        return out, weights.mean(axis=-1)
    return out


def create_projection_matrix(m: int, d: int, key: jax.Array) -> jax.Array:
    """Orthogonal random-feature projection (Performer;
    ``oursNF.py:15-50``): stacked rows of QR-orthogonalized gaussian
    blocks, rescaled by chi-distributed row norms."""
    blocks = []
    n_full = m // d
    keys = jax.random.split(key, n_full + 2)
    for i in range(n_full):
        g = jax.random.normal(keys[i], (d, d))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = m - n_full * d
    if rem > 0:
        g = jax.random.normal(keys[n_full], (d, d))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    final = jnp.concatenate(blocks, axis=0)
    multiplier = jnp.linalg.norm(
        jax.random.normal(keys[-1], (m, d)), axis=1
    )
    return multiplier[:, None] * final


def softmax_kernel_transformation(
    data, is_query: bool, projection, numerical_stabilizer: float = 1e-6
):
    """Positive random features of the softmax kernel (``oursNF.py:70-90``).
    data: [N, H, D]."""
    d = data.shape[-1]
    data = data / math.sqrt(math.sqrt(d))
    ratio = 1.0 / math.sqrt(projection.shape[0])
    data_dash = jnp.einsum(
        "nhd,md->nhm", data, projection, preferred_element_type=jnp.float32
    )
    diag = jnp.sum(jnp.square(data), axis=-1, keepdims=True) / 2.0
    if is_query:
        stab = jnp.max(data_dash, axis=-1, keepdims=True)
    else:
        stab = jnp.max(data_dash, axis=(-1, -3), keepdims=True)
    return ratio * (jnp.exp(data_dash - diag - stab) + numerical_stabilizer)


def performer_attention(
    qs,
    ks,
    vs,
    *,
    key: Optional[jax.Array] = None,
    num_features: Optional[int] = None,
    tau: float = 0.25,
    edge_index: Optional[jax.Array] = None,
    projection: Optional[jax.Array] = None,
    numerical_stabilizer: float = 1e-6,
):
    """NodeFormer's kernelized (Performer) softmax attention
    (``oursNF.py:113-150``): O(N·M) linear aggregation through positive
    random features; optionally returns per-edge attention weights for the
    edge-regularization loss (``return_weight`` path).

    ``projection`` injects a fixed [M, D] random-feature matrix instead of
    drawing one from ``key`` — used to pin the features across calls (and
    by the cross-implementation parity suite to share one projection with
    the reference's ``kernelized_softmax``)."""
    d = qs.shape[-1]
    if projection is not None:
        proj = projection
    else:
        assert key is not None, "performer_attention needs key or projection"
        m = num_features or 2 * d
        proj = create_projection_matrix(m, d, key)
    q = qs / math.sqrt(tau)
    k = ks / math.sqrt(tau)
    q_prime = softmax_kernel_transformation(
        q, True, proj, numerical_stabilizer
    )  # [N, H, M]
    k_prime = softmax_kernel_transformation(
        k, False, proj, numerical_stabilizer
    )  # [L, H, M]
    kvs = jnp.einsum(
        "lhm,lhd->hmd", k_prime, vs, preferred_element_type=jnp.float32
    )
    num = jnp.einsum("nhm,hmd->nhd", q_prime, kvs, preferred_element_type=jnp.float32)
    k_sum = k_prime.sum(axis=0)  # [H, M]
    den = jnp.einsum(
        "nhm,hm->nh", q_prime, k_sum, preferred_element_type=jnp.float32
    )[..., None]
    out = (num / den).astype(vs.dtype)
    if edge_index is not None:
        start, end = edge_index
        e_num = jnp.einsum(
            "ehm,ehm->eh", q_prime[end], k_prime[start],
            preferred_element_type=jnp.float32,
        )
        e_den = den[end, :, 0]
        return out, e_num / e_den
    return out
