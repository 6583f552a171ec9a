"""shard_map-based SPMD training: node-sharded forward/backward/update.

The whole train step — both model branches, masked loss, backward, gradient
all-reduce, Adam update, BatchNorm stat update — is ONE jitted shard_map
program per run.  Cross-device traffic per step (SURVEY.md §5):

- attention: one psum of ([H,M,D] kv-sum + [H,M] k-sum + 3 scalars) per
  TransConvLayer;
- GCN branch: one [total_nodes, F] activation all_gather per GraphConv
  layer (the cross-shard source-feature exchange);
- BatchNorm: one psum of (count, Σx, Σx²) per norm layer;
- one gradient psum (the DP-style all-reduce of the replicated params).

All collectives ride ICI; nothing touches the host inside the step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from sgformer_tpu.parallel.mesh import make_mesh
from sgformer_tpu.parallel.partition import (
    ShardGraph,
    idx_to_mask,
    node_mask_for,
    pad_to_shards,
    partition_graph,
)
from sgformer_tpu.train.trainer import Trainer


def _make_one_step(model, tx, axis_name: str, loss: str):
    """One SPMD train step on the LOCAL graph with a per-epoch key —
    shared by the single-step core and the fused multi-step scan body."""

    def one_step(params, batch_stats, opt_state, rng, train_mask, x, g,
                 label, node_mask):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                g,
                train=True,
                node_mask=node_mask,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            m = train_mask.astype(jnp.float32)
            if loss == "bce":
                per = optax.sigmoid_binary_cross_entropy(
                    out, label.astype(out.dtype)
                ).mean(axis=-1)
            else:
                logp = jax.nn.log_softmax(out)
                per = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
            s, c = jax.lax.psum((jnp.sum(per * m), jnp.sum(m)), axis_name)
            return s / c, mut["batch_stats"]

        (lv, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # The loss is psum'd inside loss_fn, so under shard_map AD every
        # device's backward seeds the replicated loss and the psum transpose
        # multiplies all cotangents by the axis size — pmean (not psum) of
        # the per-device partials yields the exact global gradient (verified
        # against the single-device path in tests/test_parallel.py).
        grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, lv

    return one_step


def make_sharded_multi_step(
    model, tx, mesh, k: int, axis_name: str = "sp", loss: str = "nll",
    donate: bool = True,
):
    """``k`` SPMD train steps fused into ONE dispatch: the key chain and
    a ``lax.scan`` over :func:`_make_one_step` run INSIDE the shard_map
    program (collectives per step ride the mesh as usual), so between
    evals there is no host round-trip per epoch — the sharded counterpart
    of ``Trainer._build_multi_step``.

    multi_step(state..., rng, train_mask, x, graph, label, node_mask)
      -> (params, batch_stats, opt_state, rng_out, losses[k])
    """
    rep = P()
    nvec = P(axis_name)
    nmat = P(axis_name, None)
    one_step = _make_one_step(model, tx, axis_name, loss)

    def multi_core(params, batch_stats, opt_state, rng, train_mask, x, g,
                   label, node_mask):
        g = g.local()

        def chain(r, _):
            r, d = jax.random.split(r)
            return r, d

        rng_out, drops = jax.lax.scan(chain, rng, None, length=k)

        def body(carry, drop):
            params, batch_stats, opt_state = carry
            params, batch_stats, opt_state, lv = one_step(
                params, batch_stats, opt_state, drop, train_mask, x, g,
                label, node_mask,
            )
            return (params, batch_stats, opt_state), lv

        (params, batch_stats, opt_state), lvs = jax.lax.scan(
            body, (params, batch_stats, opt_state), drops
        )
        return params, batch_stats, opt_state, rng_out, lvs

    label_spec = nmat if loss == "bce" else nvec
    return jax.jit(
        jax.shard_map(
            multi_core,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, nvec, nmat, nvec, label_spec,
                      nvec),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def make_sharded_steps(
    model, tx, mesh, axis_name: str = "sp", loss: str = "nll",
    donate: bool = True,
):
    """Build (train_step, eval_step) shard_map'd over ``mesh[axis_name]``.

    train_step(state, opt_state, rng, train_mask, x, graph, label, node_mask)
      -> (state, opt_state, loss)
    eval_step(state, x, graph, node_mask) -> [total_nodes, C] logits

    ``donate`` (default on) donates params/batch_stats/opt_state into the
    step — the training loop threads fresh state through every call, so XLA
    updates Adam moments and params in place instead of doubling their HBM
    footprint.  Pass ``donate=False`` only if the caller must reuse the
    pre-step state buffers afterwards (equality tests do).
    """
    rep = P()
    nvec = P(axis_name)
    nmat = P(axis_name, None)
    one_step = _make_one_step(model, tx, axis_name, loss)

    def train_core(params, batch_stats, opt_state, rng, train_mask, x, g,
                   label, node_mask):
        return one_step(params, batch_stats, opt_state, rng, train_mask, x,
                        g.local(), label, node_mask)

    label_spec = nmat if loss == "bce" else nvec
    train_step = jax.jit(
        jax.shard_map(
            train_core,
            mesh=mesh,
            in_specs=(rep, rep, rep, rep, nvec, nmat, nvec, label_spec, nvec),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2) if donate else (),
    )

    def eval_core(params, batch_stats, x, g, node_mask):
        g = g.local()
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            g,
            train=False,
            node_mask=node_mask,
        )

    eval_step = jax.jit(
        jax.shard_map(
            eval_core,
            mesh=mesh,
            in_specs=(rep, rep, nmat, nvec, nvec),
            out_specs=nmat,
            check_vma=False,
        )
    )
    return train_step, eval_step


class ShardedTrainer(Trainer):
    """Full-graph trainer on a node-sharded mesh — same loop/semantics as
    :class:`~sgformer_tpu.train.trainer.Trainer`, every step SPMD.

    The model must be built with ``axis_name`` matching the mesh axis
    (``SGFormerConfig(axis_name=...)``) so attention/BN reduce over it.
    """

    def __init__(
        self,
        model,
        graph,
        x,
        label,
        config,
        mesh=None,
        axis_name: str = "sp",
        eval_func=None,
        use_pallas: bool = False,
        use_halo: bool = True,
        chunk_dtype: str = "bf16",
    ):
        mesh = mesh if mesh is not None else make_mesh(axis_names=(axis_name,))
        self.mesh = mesh
        self.axis_name = axis_name
        num_shards = int(mesh.shape[axis_name])
        self.num_real_nodes = graph.num_nodes
        # clustering reorder (preprocess_graph(reorder=True)): permute the
        # node-indexed data up front; Trainer's _map_idx plumbing handles
        # the split indices via _inv_perm set below
        perm = getattr(graph, "node_perm", None)
        if perm is not None:
            perm = np.asarray(perm)
            x = np.asarray(x)[perm]
            label = np.asarray(label)[perm]
        shard_graph = partition_graph(
            graph, num_shards, axis_name,
            with_chunks=use_pallas, with_halo=use_halo,
            chunk_dtype=chunk_dtype,
            chunk_interpret=jax.default_backend() not in ("tpu",),
        )
        x_pad = pad_to_shards(np.asarray(x), shard_graph.total_nodes)
        super().__init__(model, shard_graph, x_pad, label, config, eval_func)
        if perm is not None:
            self._inv_perm = np.empty(len(perm), dtype=np.int64)
            self._inv_perm[perm] = np.arange(len(perm))
        self.node_mask = jnp.asarray(
            node_mask_for(self.num_real_nodes, shard_graph.total_nodes)
        )
        if config.loss == "bce":
            self.label_pad = jnp.asarray(
                pad_to_shards(np.asarray(self.label_onehot), shard_graph.total_nodes)
            )
        else:
            lab = np.asarray(label).reshape(-1).astype(np.int32)
            self.label_pad = jnp.asarray(
                pad_to_shards(lab, shard_graph.total_nodes)
            )

    # -- Trainer hooks -------------------------------------------------------

    def init_state(self, rng):
        # init must also run under shard_map: the model's collectives need
        # the mesh axis bound even while tracing shapes.
        def init_core(rng, x, g, nm):
            return self.model.init(
                {"params": rng}, x, g.local(), train=False, node_mask=nm
            )

        variables = jax.jit(
            jax.shard_map(
                init_core,
                mesh=self.mesh,
                in_specs=(P(), P(self.axis_name, None), P(self.axis_name),
                          P(self.axis_name)),
                out_specs=P(),
                check_vma=False,
            )
        )(rng, self.x, self.graph, self.node_mask)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        from sgformer_tpu.train.optim import dual_weight_decay_adam

        tx = dual_weight_decay_adam(
            params,
            self.config.lr,
            self.config.trans_weight_decay,
            self.config.gnn_weight_decay,
        )
        opt_state = tx.init(params)
        return {"params": params, "batch_stats": batch_stats}, tx, opt_state

    def _build_steps(self, tx):
        train_core, eval_core = make_sharded_steps(
            self.model, tx, self.mesh, self.axis_name, loss=self.config.loss
        )

        def train_step(state, opt_state, rng, train_mask):
            params, bs, opt_state, lv = train_core(
                state["params"],
                state["batch_stats"],
                opt_state,
                rng,
                train_mask,
                self.x,
                self.graph,
                self.label_pad,
                self.node_mask,
            )
            return {"params": params, "batch_stats": bs}, opt_state, lv

        def eval_step(state):
            out = eval_core(
                state["params"], state["batch_stats"], self.x, self.graph,
                self.node_mask,
            )
            return out[: self.num_real_nodes]

        return train_step, eval_step

    def _build_multi_step(self, tx, k: int):
        core = make_sharded_multi_step(
            self.model, tx, self.mesh, k, self.axis_name,
            loss=self.config.loss,
        )

        def multi_step(state, opt_state, rng, train_mask):
            params, bs, opt_state, rng_out, losses = core(
                state["params"],
                state["batch_stats"],
                opt_state,
                rng,
                train_mask,
                self.x,
                self.graph,
                self.label_pad,
                self.node_mask,
            )
            return ({"params": params, "batch_stats": bs}, opt_state,
                    rng_out, losses)

        return multi_step

    def _prepare_train_idx(self, split_idx):
        return jnp.asarray(
            idx_to_mask(self._map_idx(split_idx["train"]),
                        self.graph.total_nodes)
        )
