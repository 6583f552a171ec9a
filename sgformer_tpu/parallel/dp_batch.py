"""2-axis SPMD: data-parallel mini-batches × node-sharded execution.

The reference processes its random-partition batches SEQUENTIALLY on one
GPU (``/root/reference/large/main-batch.py:134-151``); on a mesh we run
``dp`` batches CONCURRENTLY — each dp group trains on its own node-induced
subgraph, node-sharded over the ``sp`` axis inside the group:

- attention / BatchNorm reduce over ``sp`` (one psum per layer, as in the
  1-D path);
- the loss is averaged over every train node of every group (psum over
  both axes);
- gradients are pmean'd over ``("dp", "sp")`` — the classic DP all-reduce
  composed with the node-sharding reduction.

Host-side, :func:`build_dp_sp_batch` assembles one static-shape device
batch: [dp, sp, ...] stacked subgraph shards + per-group feature gather
indices.  One compiled step serves every batch of every epoch.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from sgformer_tpu.graph import gcn_norm_weights
from sgformer_tpu.parallel.partition import ShardGraph


def _subgraph_shards(edge_index, node_idx, num_nodes_total, sp, edge_cap,
                     pad_nodes_to=None):
    """Relabeled node-induced subgraph, split into sp contiguous node
    blocks with dst-local edges padded to ``edge_cap`` per shard.
    ``pad_nodes_to`` sizes the node dimension for a SHORT (tail) batch so
    it shares the full batch's compiled shape; the extra rows are
    isolated pad nodes (masked out by the caller's nmask)."""
    node_idx = np.asarray(node_idx)
    b = len(node_idx)
    b_target = b if pad_nodes_to is None else int(pad_nodes_to)
    assert b <= b_target, (b, b_target)
    block = -(-b_target // sp)
    b_pad = block * sp
    mapping = np.full(num_nodes_total, -1, dtype=np.int64)
    mapping[node_idx] = np.arange(b)
    src, dst = edge_index
    mask = (mapping[src] >= 0) & (mapping[dst] >= 0)
    s, d = mapping[src[mask]], mapping[dst[mask]]
    order = np.argsort(d, kind="stable")
    s, d = s[order], d[order]
    w = gcn_norm_weights(s, d, b).astype(np.float32)
    out_src = np.zeros((sp, edge_cap), dtype=np.int32)
    out_dst = np.zeros((sp, edge_cap), dtype=np.int32)
    out_w = np.zeros((sp, edge_cap), dtype=np.float32)
    bounds = np.searchsorted(d, np.arange(0, b_pad + 1, block))
    for shard in range(sp):
        e0, e1 = bounds[shard], bounds[shard + 1]
        k = e1 - e0
        if k > edge_cap:
            raise ValueError(f"edge_cap {edge_cap} < shard edges {k}")
        out_src[shard, :k] = s[e0:e1]
        out_dst[shard, :k] = d[e0:e1] - shard * block
        out_w[shard, :k] = w[e0:e1]
    return out_src, out_dst, out_w, block, b_pad


def build_dp_sp_batch(
    edge_index: np.ndarray,
    node_batches: Sequence[np.ndarray],
    num_nodes_total: int,
    sp: int,
    edge_cap: int,
    axis_name: str = "sp",
    pad_nodes_to=None,
):
    """Stack ``dp = len(node_batches)`` subgraph batches into one
    [dp, sp, ...] device batch.  All batches share one COMPILED size:
    ``pad_nodes_to`` (default: the first batch's length); shorter (even
    empty) batches — the epoch's remainder step — are padded with
    isolated nodes and masked via the returned nmask."""
    dp = len(node_batches)
    b = int(pad_nodes_to) if pad_nodes_to is not None else len(node_batches[0])
    srcs, dsts, ws = [], [], []
    block = b_pad = None
    for nb in node_batches:
        assert len(nb) <= b, "dp batch longer than pad_nodes_to"
        s, d, w, block, b_pad = _subgraph_shards(
            edge_index, nb, num_nodes_total, sp, edge_cap, pad_nodes_to=b
        )
        srcs.append(s)
        dsts.append(d)
        ws.append(w)
    graph = ShardGraph(
        src=jnp.asarray(np.stack(srcs)),
        dst=jnp.asarray(np.stack(dsts)),
        weight=jnp.asarray(np.stack(ws)),
        num_nodes=int(block),
        total_nodes=int(b_pad),
        num_shards=int(sp),
        axis_name=axis_name,
    )
    # per-group padded node index lists (pad rows repeat node 0, masked out)
    idx = np.zeros((dp, b_pad), dtype=np.int64)
    nmask = np.zeros((dp, b_pad), dtype=np.float32)
    for g, nb in enumerate(node_batches):
        idx[g, : len(nb)] = nb
        nmask[g, : len(nb)] = 1.0
    return graph, idx, nmask


def make_dp_sp_train_step(
    model, tx, mesh, dp_axis: str = "dp", sp_axis: str = "sp",
    loss: str = "nll", donate: bool = True,
):
    """shard_map'd step over a 2-D (dp, sp) mesh.

    Inputs (leading [dp, sp] or [dp, N_pad] dims): x [dp, N_pad, F] sharded
    P(dp, sp·…) via node blocks, graph (stacked ShardGraph), label
    [dp, N_pad], train/node masks [dp, N_pad].

    ``donate`` donates params/batch_stats/opt_state (in-place Adam update);
    disable only when the caller reuses pre-step state buffers.
    """
    rep = P()
    gspec = P(dp_axis, sp_axis)
    nvec = P(dp_axis, sp_axis)
    nmat = P(dp_axis, sp_axis, None)

    def step(params, batch_stats, opt_state, rng, x, g, label, tmask, nmask):
        g = g.local()
        x = x.reshape(x.shape[-2:])
        label = label.reshape(label.shape[-1])
        tmask = tmask.reshape(tmask.shape[-1])
        nmask = nmask.reshape(nmask.shape[-1])
        rng = jax.random.fold_in(
            jax.random.fold_in(rng, jax.lax.axis_index(dp_axis)),
            jax.lax.axis_index(sp_axis),
        )

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                g,
                train=True,
                node_mask=nmask,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            m = tmask.astype(jnp.float32)
            if loss == "bce":
                per = optax.sigmoid_binary_cross_entropy(
                    out, label.astype(out.dtype)
                ).mean(axis=-1)
            else:
                logp = jax.nn.log_softmax(out)
                per = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
            s, c = jax.lax.psum(
                (jnp.sum(per * m), jnp.sum(m)), (dp_axis, sp_axis)
            )
            # max(c,1): a remainder step may carry zero train nodes
            return s / jnp.maximum(c, 1.0), mut["batch_stats"]

        (lv, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, (dp_axis, sp_axis))
        # sync BN running stats across groups, weighted by each group's
        # REAL node count: the epoch-remainder step carries short (even
        # empty) groups whose decayed stats must not skew the estimate;
        # for equal full groups this reduces like a plain pmean
        gcount = jax.lax.psum(jnp.sum(nmask), sp_axis)
        wsum = jax.lax.psum(gcount, dp_axis)
        new_bs = jax.tree.map(
            lambda t: jax.lax.psum(t * (gcount / wsum), dp_axis), new_bs
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, lv

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, nmat, gspec, nvec, nvec, nvec),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2) if donate else (),
    )
