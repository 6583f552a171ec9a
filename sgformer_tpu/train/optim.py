"""Optimizer: Adam with per-branch weight decay.

The reference trains with
``Adam([{params1, weight_decay=trans_wd}, {params2, weight_decay=gnn_wd}], lr)``
(``large/main.py:114-119``) where ``params1`` is the attention branch and
``params2`` the GNN branch + fusion head (``large/ours.py:261-263``).
Torch ``Adam(weight_decay=w)`` is L2-regularization folded into the
gradient BEFORE the moment updates (not AdamW), so the optax equivalent is
masked ``add_decayed_weights`` in front of ``scale_by_adam``.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def _branch_of(path: tuple) -> str:
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    return "trans" if top == "trans_conv" else "gnn"


def branch_mask(params: Any, branch: str):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _branch_of(path) == branch, params
    )


def dual_weight_decay_adam(
    params: Any,
    lr: float,
    trans_weight_decay: float,
    gnn_weight_decay: float,
) -> optax.GradientTransformation:
    """Adam(lr) with L2 decay ``trans_weight_decay`` on the attention branch
    and ``gnn_weight_decay`` on everything else (GNN branch + head)."""
    return optax.chain(
        optax.masked(
            optax.add_decayed_weights(trans_weight_decay),
            branch_mask(params, "trans"),
        ),
        optax.masked(
            optax.add_decayed_weights(gnn_weight_decay),
            branch_mask(params, "gnn"),
        ),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def adam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Plain torch-style Adam(+L2) for baseline models."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr)]
    return optax.chain(*steps)
